package graft

import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.sync.SyncWorker

/** SyncWorker lifecycle specs (reference scheduler/sync_worker.py:
  * status transitions, pause/resume between cycles, stop, error
  * capture, progress callback). Pure JVM — no Spark session needed.
  */
class SyncWorkerSpec extends AnyFunSuite {

  private def await(cond: => Boolean, ms: Long = 5000): Boolean = {
    val deadline = System.nanoTime() + ms * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(5)
    cond
  }

  test("runs cycles on the interval, accumulates rows, reports progress") {
    val progress = new AtomicLong(0)
    val w = new SyncWorker(() => 10L, intervalMillis = 1,
      onProgress = (_, total) => progress.set(total))
    w.start()
    assert(await(w.cycles >= 3))
    assert(w.status == SyncWorker.Running)
    w.stop()
    assert(w.status == SyncWorker.Completed)
    assert(w.totalRows == w.cycles * 10)
    assert(progress.get() > 0)
  }

  test("pause parks between cycles; resume continues; double start rejected") {
    val gate = new CountDownLatch(1)
    val w = new SyncWorker(() => { gate.countDown(); 1L }, intervalMillis = 1)
    w.start()
    intercept[IllegalStateException] { w.start() }
    assert(gate.await(5, TimeUnit.SECONDS))
    w.pause()
    assert(await(w.status == SyncWorker.Paused))
    val atPause = w.cycles
    Thread.sleep(50)
    assert(w.cycles <= atPause + 1) // at most the in-flight cycle finished
    w.resume()
    assert(await(w.cycles > atPause + 1)) // running again
    w.stop()
    assert(w.status == SyncWorker.Completed)
  }

  test("a crashing cycle moves the worker to error with the message") {
    val w = new SyncWorker(() => throw new RuntimeException("db down"), 1)
    w.start()
    assert(await(w.status == SyncWorker.Error))
    assert(w.errorInfo.contains("db down"))
    w.stop() // no-op on an errored worker, must not hang
    assert(w.status == SyncWorker.Error)
  }

  test("stop before start is a no-op; states are the reference's vocabulary") {
    val w = new SyncWorker(() => 0L, 1)
    assert(w.status == SyncWorker.Idle)
    w.stop()
    assert(w.status == SyncWorker.Idle)
  }
}
