package graft.util

import scala.annotation.tailrec

/** Bounded-retry combinator — the Spark-side twin of the reference's
  * generic `withRetries` (reference package.scala:8-17: tail-recursive,
  * fixed try budget, caller-supplied error hook) with the exponential
  * backoff hook the reference sink installs
  * (reference KinesisGraphStage.scala:92-98: 2^n seconds per retry).
  * The sleeper is injectable so specs run without wall-clock waits.
  */
object Retry {

  /** @param retryable error taxonomy (reference KinesisSource.scala:
    *   290-302): transient/service errors retry, client errors (bad
    *   request, auth) fail fast — retrying them can never succeed. */
  @tailrec
  def withRetries[T](tries: Int = 7, onError: (Throwable, Int) => Unit = (_, _) => (),
                     retryable: Throwable => Boolean = _ => true)(f: => T): T =
    try f catch {
      case err: Throwable =>
        if (tries < 1 || !retryable(err)) throw err
        else {
          onError(err, tries)
          withRetries(tries - 1, onError, retryable)(f)
        }
    }

  /** 2^n-seconds backoff hook (n = remaining tries, as in the reference),
    * capped so a full 7-try budget can't sleep past `capMs` per wait.
    * The exponent is clamped BEFORE the power: 2^n·1000 wraps negative
    * past n=53, and min(negative, cap) would hand Thread.sleep a
    * negative duration — an IllegalArgumentException thrown from inside
    * the retry hook, aborting every remaining retry on large budgets. */
  def expBackoff(sleeper: Long => Unit = Thread.sleep, capMs: Long = 64000L): (Throwable, Int) => Unit =
    (_, n) => sleeper(
      if (n >= 20) capMs
      else math.min(math.pow(2, n).toLong * 1000L, capMs))
}
