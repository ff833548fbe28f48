package graft.util

/** I6 — exponential backoff with a wall-clock ceiling (reference
  * `address_etl/crud.py:19-24`: `backoff.expo` capped by
  * `http_retry_max_time_in_seconds`=900), plus the ESRI token-refresh
  * special case (`geocode.py:452-466`: an application-level 498
  * "invalid token" response triggers a re-auth then an immediate retry
  * that does NOT count against the backoff budget).
  *
  * Clock and sleeper are injectable so tests run instantly.
  */
object Retry {

  final class TokenExpired(msg: String) extends RuntimeException(msg)

  def withBackoff[T](
      maxTimeSeconds: Int = 900,
      baseDelaySeconds: Double = 1.0,
      maxDelaySeconds: Double = 60.0,
      isRetryable: Throwable => Boolean = _ => true,
      onTokenExpired: () => Unit = () => (),
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong),
      now: () => Long = () => System.nanoTime(),
  )(body: => T): T = {
    val deadline = now() + maxTimeSeconds * 1_000_000_000L
    var attempt = 0
    var consecutiveTokenFailures = 0
    def backoffOrThrow(e: Throwable): Unit = {
      val delay = math.min(baseDelaySeconds * math.pow(2, attempt), maxDelaySeconds)
      if (now() + (delay * 1e9).toLong > deadline) throw e
      sleep(delay)
      attempt += 1
    }
    while (true) {
      try return body
      catch {
        // task cancellation must win over the retry budget: the old
        // catch-all swallowed InterruptedException, so a killed or
        // speculated task kept sleeping and re-fetching as a zombie
        case e: InterruptedException => throw e
        case e: TokenExpired =>
          // FIRST rejection: re-auth then retry immediately (reference
          // parity — the 498 path does not count against the backoff
          // budget); CONSECUTIVE rejections back off like any failure:
          // the reference is one sequential client, but here every
          // executor task would otherwise hammer the token endpoint at
          // max rate for the whole budget (rate limits, account lockout)
          if (now() > deadline) throw e
          if (consecutiveTokenFailures > 0) backoffOrThrow(e)
          consecutiveTokenFailures += 1
          // a throwing refresh (transient DNS blip to the token service)
          // must consume retry budget, not escape it
          try onTokenExpired()
          catch {
            case re: InterruptedException => throw re
            case re if scala.util.control.NonFatal(re) && isRetryable(re) =>
              backoffOrThrow(re)
            }
        case e if scala.util.control.NonFatal(e) && isRetryable(e) =>
          consecutiveTokenFailures = 0
          backoffOrThrow(e)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
