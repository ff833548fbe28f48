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
    while (true) {
      try return body
      catch {
        case e: TokenExpired =>
          // re-auth then retry immediately; not a BACKOFF attempt, but
          // still bounded by the wall-clock deadline — a token the service
          // rejects after every refresh (revoked credentials, clock skew)
          // must exhaust the budget, not loop forever
          if (now() > deadline) throw e
          onTokenExpired()
        case e: Throwable if isRetryable(e) =>
          val delay = math.min(baseDelaySeconds * math.pow(2, attempt), maxDelaySeconds)
          if (now() + (delay * 1e9).toLong > deadline) throw e
          sleep(delay)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
