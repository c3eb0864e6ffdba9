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

  @tailrec
  def withRetries[T](tries: Int = 7, onError: (Throwable, Int) => Unit = (_, _) => ())(f: => T): T =
    try f catch {
      case err: Throwable =>
        if (tries < 1) throw err
        else {
          onError(err, tries)
          withRetries(tries - 1, onError)(f)
        }
    }

  /** 2^n-seconds backoff hook (n = remaining tries, as in the reference),
    * capped so a full 7-try budget can't sleep past `capMs` per wait. */
  def expBackoff(sleeper: Long => Unit = Thread.sleep, capMs: Long = 64000L): (Throwable, Int) => Unit =
    (_, n) => sleeper(math.min(math.pow(2, n).toLong * 1000L, capMs))
}
