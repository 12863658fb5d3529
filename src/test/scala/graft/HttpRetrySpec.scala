package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{HttpRetry, HttpStatusException}

/** Pure-JVM tests for the transport retry discipline (no SparkSession —
  * the production HTTP clients themselves are untestable in the
  * zero-egress environment; the retry logic is where the behavior
  * lives). */
class HttpRetrySpec extends AnyFunSuite {

  private def flaky[T](failures: Int, t: => Throwable)(result: T): () => T = {
    var n = 0
    () => { if (n < failures) { n += 1; throw t } else result }
  }

  test("transient statuses retry up to the attempt budget, then succeed") {
    val slept = Seq.newBuilder[Long]
    val f = flaky(2, new HttpStatusException(503, "unavailable"))("ok")
    val got = HttpRetry.withRetries(attempts = 3, baseDelayMs = 100,
      sleep = slept += _)(f())
    assert(got === "ok")
    assert(slept.result() === Seq(100L, 200L)) // deterministic backoff
  }

  test("exhausted attempts rethrow the transient failure") {
    val f = flaky(5, new HttpStatusException(429, "throttled"))("unreached")
    val e = intercept[HttpStatusException] {
      HttpRetry.withRetries(attempts = 3, sleep = _ => ())(f())
    }
    assert(e.status === 429)
  }

  test("non-transient statuses fail immediately, no retry") {
    var calls = 0
    intercept[HttpStatusException] {
      HttpRetry.withRetries(attempts = 3, sleep = _ => ()) {
        calls += 1; throw new HttpStatusException(404, "absent")
      }
    }
    assert(calls === 1)
  }

  test("connect-phase I/O failures are transient; other throwables are not") {
    assert(HttpRetry.isTransient(new java.net.ConnectException("refused")))
    assert(!HttpRetry.isTransient(new IllegalStateException("bug")))
    assert(!HttpRetry.isTransient(new HttpStatusException(400, "bad")))
    assert(HttpRetry.isTransient(new HttpStatusException(502, "gateway")))
  }

  test("onRetry fires once per retried attempt, never on success/give-up") {
    val seen = Seq.newBuilder[Int]
    val f = flaky(2, new HttpStatusException(503, "unavailable"))("ok")
    val got = HttpRetry.withRetries(attempts = 3, sleep = _ => (),
      onRetry = t => seen +=
        t.asInstanceOf[HttpStatusException].status)(f())
    assert(got === "ok")
    assert(seen.result() === Seq(503, 503)) // 2 failures -> 2 hook calls
    var calls = 0
    intercept[HttpStatusException] { // non-transient: no hook
      HttpRetry.withRetries(attempts = 3, sleep = _ => (),
        onRetry = _ => calls += 1) {
        throw new HttpStatusException(404, "absent")
      }
    }
    assert(calls === 0)
  }

  test("a throwing onRetry hook cannot break the retry loop") {
    val f = flaky(2, new HttpStatusException(503, "unavailable"))("ok")
    val got = HttpRetry.withRetries(attempts = 3, sleep = _ => (),
      onRetry = _ => throw new RuntimeException("faulty hook"))(f())
    assert(got === "ok") // the transient failure still retried to success
  }

  test("interruption in the hook aborts the loop and keeps the flag set") {
    // cancellation must win over retrying: no further attempts, the
    // InterruptedException propagates, and the interrupt status is
    // restored for the caller
    val f = flaky(2, new HttpStatusException(503, "unavailable"))("ok")
    var attempts = 0
    intercept[InterruptedException] {
      HttpRetry.withRetries(attempts = 3, sleep = _ => (),
        onRetry = _ => throw new InterruptedException("cancelled")) {
        attempts += 1; f()
      }
    }
    assert(attempts === 1) // the interrupted retry never re-ran the body
    assert(Thread.interrupted()) // flag was set (and cleared for the suite)
  }
}
