package graft.sources

/** Retry discipline shared by the production HTTP transports.
  *
  * Only IDEMPOTENT calls go through [[HttpRetry.withRetries]]: Jaeger
  * GETs, ES search opens / aggregations / clear-scroll. ES *scroll
  * continuations* are deliberately NOT retried — the server advances the
  * cursor while producing a response, so re-issuing a continuation whose
  * response was lost mid-flight would silently skip a page; a failed
  * continuation surfaces as an error and the task re-runs its slice from
  * the open (Spark's task retry), which is the correct recovery unit.
  *
  * Backoff is deterministic (base × 2^attempt, no jitter): reproducible
  * in tests, and the per-scan client parallelism is bounded by the slice
  * count, so a synchronized stampede can't form.
  */
class HttpStatusException(val status: Int, msg: String)
    extends RuntimeException(msg)

object HttpRetry {
  /** 429 + gateway-ish 5xx are transient; 4xx (auth, bad request, not
    * found) are not. Connect-phase I/O failures never reached the server
    * and are always safe to retry. */
  def isTransient(t: Throwable): Boolean = t match {
    case e: HttpStatusException =>
      e.status == 429 || e.status == 502 || e.status == 503 ||
        e.status == 504
    case _: java.net.ConnectException => true
    case _: java.net.http.HttpConnectTimeoutException => true
    case _ => false
  }

  /** `onRetry` fires between a transient failure and the next attempt —
    * the hook for best-effort cleanup/diagnostics on calls whose failure
    * may have left server-side state (ES scroll opens foremost). A hook
    * that throws a non-fatal error is swallowed here: retry semantics
    * must never depend on a diagnostics side-channel behaving. Fatal
    * errors (OOM, etc.) propagate, and an InterruptedException restores
    * the thread's interrupt status so the caller's cancellation isn't
    * silently eaten by the retry loop. */
  def withRetries[T](attempts: Int = 3, baseDelayMs: Long = 200,
      sleep: Long => Unit = Thread.sleep,
      onRetry: Throwable => Unit = _ => ())(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case t: Throwable if isTransient(t) && attempt < attempts - 1 =>
          // A faulty hook must not break the loop (NonFatal swallowed),
          // but cancellation must break it UNCONDITIONALLY — restoring
          // the flag and falling through to sleep+retry would only
          // honor the interrupt if the injected sleep happens to check
          // it, so rethrow after restoring.
          try onRetry(t) catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt()
              throw ie
            case scala.util.control.NonFatal(_) => ()
          }
          sleep(baseDelayMs << attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
