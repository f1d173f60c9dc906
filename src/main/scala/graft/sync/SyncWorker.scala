package graft.sync

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import java.util.concurrent.CountDownLatch

/** Background periodic sync loop with a pause/resume/stop lifecycle.
  *
  * Reference: src/oracle_duckdb_sync/scheduler/sync_worker.py
  * (`SyncWorker` — background thread, idle/running/paused/completed/
  * error states, pause/resume events, progress callback) and
  * scheduler/scheduler.py (interval trigger + overlap-protected job).
  *
  * Spark context: the STREAMING path for periodic sync is Structured
  * Streaming (graft.streaming.IncrementalStream — state in
  * checkpoints, not threads). This worker is the BATCH counterpart for
  * deployments that schedule discrete sync cycles (the reference's
  * nightly cron): each tick runs `cycle` (e.g. `SyncRunner.syncAll`)
  * at most once at a time — a tick that fires while the previous one
  * still runs is skipped, the reference's lock-protected job.
  *
  * Thread-safety: status transitions via atomics; pause parks BETWEEN
  * cycles (a Spark job in flight is never interrupted mid-shuffle —
  * same granularity as the reference, which pauses between batches).
  */
class SyncWorker(cycle: () => Long,
                 intervalMillis: Long,
                 onProgress: (Long, Long) => Unit = (_, _) => ()) {

  import SyncWorker._

  private val state = new AtomicReference[String](Idle)
  private val rows = new AtomicLong(0L)
  private val cyclesRun = new AtomicLong(0L)
  private val lastError = new AtomicReference[Option[String]](None)
  private val stopped = new CountDownLatch(1)
  private val lock = new Object
  @volatile private var thread: Option[Thread] = None

  def status: String = state.get()
  def totalRows: Long = rows.get()
  def cycles: Long = cyclesRun.get()
  def errorInfo: Option[String] = lastError.get()

  /** Start the loop in a daemon thread; rejects double-starts. */
  def start(): Unit = {
    if (!state.compareAndSet(Idle, Running))
      throw new IllegalStateException(s"worker is ${state.get()}, not idle")
    val t = new Thread(() => runLoop(), "graft-sync-worker")
    t.setDaemon(true)
    thread = Some(t)
    t.start()
  }

  /** Park after the in-flight cycle finishes. */
  def pause(): Unit = state.compareAndSet(Running, Paused)

  def resume(): Unit =
    if (state.compareAndSet(Paused, Running)) lock.synchronized(lock.notifyAll())

  /** Stop after the in-flight cycle; blocks until the thread exits. */
  def stop(): Unit = {
    state.getAndUpdate(s => if (s == Idle || s == Error) s else Stopping)
    lock.synchronized(lock.notifyAll())
    if (thread.exists(_.isAlive)) stopped.await()
    state.compareAndSet(Stopping, Completed)
  }

  private def runLoop(): Unit = {
    try {
      var go = true
      while (go) {
        state.get() match {
          case Running =>
            val n = cycle() // never concurrent with itself: one loop thread
            rows.addAndGet(n)
            cyclesRun.incrementAndGet()
            onProgress(cyclesRun.get(), rows.get())
            lock.synchronized {
              if (state.get() == Running) lock.wait(intervalMillis)
            }
          case Paused =>
            lock.synchronized { if (state.get() == Paused) lock.wait() }
          case _ => go = false
        }
      }
    } catch {
      case e: Throwable =>
        lastError.set(Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        state.set(Error)
    } finally stopped.countDown()
  }
}

object SyncWorker {
  val Idle = "idle"
  val Running = "running"
  val Paused = "paused"
  val Stopping = "stopping"
  val Completed = "completed"
  val Error = "error"
}
