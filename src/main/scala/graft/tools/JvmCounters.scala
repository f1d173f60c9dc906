package graft.tools

/** JVM-wide attribution counters shared by Bench's per-run spread
  * blocks and the soak harnesses: in local mode the driver JVM IS the
  * executors, so deltas of these around a run are the run's whole
  * bill. Reading them around a timed body separates drift classes
  * mechanically — wall up with cpu tracking wall and gc/jit flat =
  * clock/contention; jit/gc up = JVM-side; codegen compiles > 0 on a
  * warm run = generated-class-cache miss.
  */
object JvmCounters {

  /** Total GC milliseconds across all collector beans of this JVM. */
  def gcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  /** Total JIT compilation milliseconds so far in this JVM (-1 if the
    * bean does not support timing).
    */
  def jitMs(): Long = {
    val b = java.lang.management.ManagementFactory.getCompilationMXBean
    if (b != null && b.isCompilationTimeMonitoringSupported)
      b.getTotalCompilationTime
    else -1L
  }

  /** Cumulative process CPU seconds (all threads). */
  def cpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        val t = os.getProcessCpuTime
        if (t < 0) -1.0 else t / 1e9
      case _ => -1.0
    }

  /** Whole-stage-codegen compilations so far in this JVM (count, total
    * bytecode bytes). A nonzero per-run delta on a steady-state run
    * means the generated-class cache is missing.
    */
  def codegenStats(): (Long, Long) = {
    val m = org.apache.spark.metrics.source.CodegenMetrics
    (m.METRIC_COMPILATION_TIME.getCount,
      m.METRIC_GENERATED_METHOD_BYTECODE_SIZE.getCount)
  }

  /** One snapshot of all four counters. */
  final case class Snap(gcMs: Long, jitMs: Long, cpuSec: Double,
                        codegenCompiles: Long)

  def snap(): Snap = Snap(gcMs(), jitMs(), cpuSec(), codegenStats()._1)

  /** Delta of `after` over `before` (component-wise). */
  def delta(before: Snap, after: Snap): Snap =
    Snap(after.gcMs - before.gcMs, after.jitMs - before.jitMs,
      after.cpuSec - before.cpuSec,
      after.codegenCompiles - before.codegenCompiles)
}
