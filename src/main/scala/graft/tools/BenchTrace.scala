package graft.tools

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Opt-in per-stage bench instrumentation (SPARK_GRAFT_BENCH_TRACE=1).
  *
  * Purpose: turn "query X is sometimes 5× slower in-suite" from a theory
  * contest into committed evidence. Stage→(query,run) attribution rides
  * the job's LOCAL PROPERTIES (`graft.bench.label`, set by Bench before
  * each run): the scheduler snapshots them at job submission and the
  * submission event carries them, so attribution is exact even when the
  * async listener bus delivers an event after Bench has moved to the
  * next run — reading a shared mutable label at DELIVERY time would
  * stamp boundary stages with the wrong run. The volatile label remains
  * only as a fallback for events that carry no properties (RDD
  * unpersist), whose boundary fuzziness is inherent and noted. Per
  * stage it accumulates task-level metrics (run/GC/CPU time, shuffle
  * bytes, spills, input bytes) from onTaskEnd, which is populated for
  * every successful task, rather than relying on
  * StageInfo.taskMetrics internals.
  *
  * Driver-JVM GC per run is measured separately in Bench via the GC
  * MXBeans — in local mode driver == executors, so that delta is the
  * whole truth even for work the listener misattributes.
  */
final class BenchTraceListener extends SparkListener {

  final class StageAgg(val label: String, val stageId: Int, val attempt: Int,
                       val name: String, val numTasks: Int) {
    var submitMs = -1L
    var completeMs = -1L
    var tasks = 0
    var runMs = 0L
    var gcMs = 0L
    var cpuMs = 0L
    var shufReadB = 0L
    var shufWriteB = 0L
    var spillMemB = 0L
    var spillDiskB = 0L
    var inputB = 0L
    var resultSerMs = 0L
    def durMs: Long = if (submitMs >= 0 && completeMs >= 0) completeMs - submitMs else -1L
  }

  @volatile private var label: String = "_setup"
  def setLabel(l: String): Unit = label = l

  private val stages = new ConcurrentHashMap[(Int, Int), StageAgg]()
  private val unpersists = new ConcurrentHashMap[String, java.lang.Integer]()

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
    val si = e.stageInfo
    // exact attribution: the submitting job's local-property snapshot
    // rides the event; the volatile label is only the no-properties
    // fallback (e.g. stages submitted outside a labeled run)
    val lab = Option(e.properties)
      .flatMap(p => Option(p.getProperty(BenchTrace.LabelProp)))
      .getOrElse(label)
    val agg = new StageAgg(lab, si.stageId, si.attemptNumber(),
      si.name.linesIterator.next().take(100), si.numTasks)
    agg.submitMs = si.submissionTime.getOrElse(System.currentTimeMillis())
    stages.put((si.stageId, si.attemptNumber()), agg)
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val agg = stages.get((e.stageId, e.stageAttemptId))
    val m = e.taskMetrics
    if (agg != null && m != null) agg.synchronized {
      agg.tasks += 1
      agg.runMs += m.executorRunTime
      agg.gcMs += m.jvmGCTime
      agg.cpuMs += m.executorCpuTime / 1000000L
      agg.shufReadB += m.shuffleReadMetrics.totalBytesRead
      agg.shufWriteB += m.shuffleWriteMetrics.bytesWritten
      agg.spillMemB += m.memoryBytesSpilled
      agg.spillDiskB += m.diskBytesSpilled
      agg.inputB += m.inputMetrics.bytesRead
      agg.resultSerMs += m.resultSerializationTime
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val si = e.stageInfo
    val agg = stages.get((si.stageId, si.attemptNumber()))
    if (agg != null) {
      si.submissionTime.foreach(t => agg.submitMs = t)
      agg.completeMs = si.completionTime.getOrElse(System.currentTimeMillis())
    }
  }

  override def onUnpersistRDD(e: SparkListenerUnpersistRDD): Unit =
    unpersists.merge(label, 1, (a, b) => a + b)

  /** Stage records grouped by label, insertion-ordered by stageId. */
  def snapshot(): (Map[String, Seq[StageAgg]], Map[String, Int]) = {
    import scala.jdk.CollectionConverters._
    val byLabel = stages.values().asScala.toSeq.sortBy(_.stageId).groupBy(_.label)
    val unp = unpersists.asScala.map { case (k, v) => k -> v.intValue() }.toMap
    (byLabel, unp)
  }
}

object BenchTrace {

  /** Local-property key Bench sets before each run; the scheduler's
    * per-job snapshot delivers it with every stage-submitted event.
    */
  val LabelProp = "graft.bench.label"

  /** Serialize the trace as one JSON file. Bytes in MB (2dp) to keep the
    * file reviewable; stages under 50ms duration AND zero shuffle/spill
    * are dropped per label (tiny local jobs — noise at 63 queries × runs).
    */
  def write(path: String, listener: BenchTraceListener,
            runMeta: Seq[(String, Double, Long, Long)]): Unit = {
    val (byLabel, unp) = listener.snapshot()
    // Locale.ROOT: comma-decimal default locales must not corrupt JSON
    def mb(b: Long): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(b / 1048576.0))
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "
      case c => c.toString
    }
    val sb = new StringBuilder
    sb.append("{\"runs\":[\n")
    val items = runMeta.map { case (lab, wallSec, gcMs, compiles) =>
      val stages = byLabel.getOrElse(lab, Nil)
        .filter(s => s.durMs >= 50 || s.shufReadB + s.shufWriteB + s.spillMemB > 0)
      val stJson = stages.map { s =>
        s"""{"id":${s.stageId},"name":"${esc(s.name)}","durMs":${s.durMs},"tasks":${s.tasks},""" +
          s""""runMs":${s.runMs},"gcMs":${s.gcMs},"cpuMs":${s.cpuMs},""" +
          s""""shufReadMB":${mb(s.shufReadB)},"shufWriteMB":${mb(s.shufWriteB)},""" +
          s""""spillMemMB":${mb(s.spillMemB)},"spillDiskMB":${mb(s.spillDiskB)},""" +
          s""""inputMB":${mb(s.inputB)}}"""
      }.mkString("[", ",", "]")
      s"""{"run":"${esc(lab)}","wallSec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(wallSec))},"driverGcMs":$gcMs,"codegenCompiles":$compiles,""" +
        s""""unpersists":${unp.getOrElse(lab, 0)},"stages":$stJson}"""
    }
    sb.append(items.mkString(",\n"))
    sb.append("\n]}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes("UTF-8"))
  }
}
