package graft.pipeline

/** Driver-side rate limiter for the external API connector — the
  * reference's discipline (api_client/client.py:35-53): at most
  * `maxPerSecond` requests per second plus a fixed `throttleMs` pause
  * between calls, with bounded retries and linear backoff
  * (client.py:201-229). Injectable clock/sleeper for tests.
  *
  * This is deliberately NOT dataflow: the constraint belongs to the
  * external service, so it lives where the reference put it — on the
  * single driver thread that talks to the service (SURVEY §2.1 S1).
  */
final class RateLimiter(
    maxPerSecond: Double = 2.0,
    throttleMs: Long = 500,
    nowMs: () => Long = () => System.currentTimeMillis(),
    sleepMs: Long => Unit = Thread.sleep) {

  private val minIntervalMs = math.max((1000.0 / maxPerSecond).toLong, throttleMs)
  private var lastCall = Long.MinValue

  /** Block until a call is allowed, then record it. */
  def acquire(): Unit = synchronized {
    val now = nowMs()
    val wait = lastCall + minIntervalMs - now
    if (wait > 0) sleepMs(wait)
    lastCall = math.max(now, lastCall + minIntervalMs)
  }

  /** Wrap a fetch function with rate limiting + bounded linear-backoff
    * retries (attempt i sleeps i * backoffMs before retrying).
    */
  def limited[A, B](maxRetries: Int = 3, backoffMs: Long = 1000)(
      fetch: A => B): A => B = { a =>
    var attempt = 0
    var out: Option[B] = None
    var lastErr: Throwable = null
    while (out.isEmpty && attempt < maxRetries) {
      acquire()
      try out = Some(fetch(a))
      catch {
        case scala.util.control.NonFatal(e) =>
          lastErr = e
          attempt += 1
          if (attempt < maxRetries) sleepMs(attempt * backoffMs)
      }
    }
    out.getOrElse(throw lastErr)
  }
}
