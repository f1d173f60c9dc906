package graft.sync

import scala.annotation.tailrec

/** Driver-side retry for sync actions (reference:
  * test/database/test_sync_engine.py test_082_retry_on_failure — the
  * sync engine retries a failed batch before surfacing the error).
  * Task-level failures inside a job are already retried by Spark; this
  * covers whole-action failures (source connectivity, transient FS
  * errors) around `df.write`/`collect` calls.
  */
object Retry {

  /** Run `action`, retrying up to `maxAttempts` total tries with
    * linear backoff. Throws the LAST failure if all attempts fail.
    */
  def withRetries[T](maxAttempts: Int, backoffMs: Long = 0L)(action: => T): T = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    @tailrec
    def go(attempt: Int): T = {
      val r = try Right(action) catch { case e: Throwable => Left(e) }
      r match {
        case Right(v) => v
        case Left(e) if attempt >= maxAttempts => throw e
        case Left(_) =>
          if (backoffMs > 0) Thread.sleep(backoffMs * attempt)
          go(attempt + 1)
      }
    }
    go(1)
  }
}
