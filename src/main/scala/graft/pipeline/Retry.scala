package graft.pipeline

import scala.annotation.tailrec
import scala.util.control.NonFatal

/** Exponential-backoff retry for driver-side actions.
  *
  * Reference: src/pipeline/utils/retry.py:19 (decorator with
  * max_attempts / base_delay / backoff multiplier / retryable exception
  * filter). In Spark this wraps *actions* (writes, collects) — tasks
  * inside a job already retry via `spark.task.maxFailures`; this guards
  * the job-level failures the reference retried (sink unavailable,
  * transient FS errors). */
object Retry {

  /** Run `f`, retrying up to `maxAttempts` with delay
    * `baseDelayMs * factor^(attempt-1)` capped at `maxDelayMs`.
    * `retryOn` filters which failures are retryable (default: any
    * non-fatal). */
  def withBackoff[T](maxAttempts: Int = 3,
                     baseDelayMs: Long = 100,
                     factor: Double = 2.0,
                     maxDelayMs: Long = 30000,
                     retryOn: Throwable => Boolean = NonFatal(_),
                     sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    require(maxAttempts >= 1)
    @tailrec
    def loop(attempt: Int): T = {
      val r = try Right(f) catch { case e: Throwable => Left(e) }
      r match {
        case Right(v) => v
        case Left(e) if attempt >= maxAttempts || !retryOn(e) => throw e
        case Left(_) =>
          val delay = math.min(
            (baseDelayMs * math.pow(factor, (attempt - 1).toDouble)).toLong,
            maxDelayMs)
          sleep(delay)
          loop(attempt + 1)
      }
    }
    loop(1)
  }
}
