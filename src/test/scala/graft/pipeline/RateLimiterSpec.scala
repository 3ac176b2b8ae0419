package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class RateLimiterSpec extends AnyFunSuite {

  private class FakeClock {
    var t = 0L
    val sleeps = scala.collection.mutable.ListBuffer[Long]()
    def now(): Long = t
    def sleep(ms: Long): Unit = { sleeps += ms; t += ms }
  }

  test("spaces calls at the max rate (2/s -> 500ms apart)") {
    val c = new FakeClock
    val rl = new RateLimiter(2.0, 500, c.now _, c.sleep)
    rl.acquire()            // first call free
    rl.acquire()            // must wait 500ms
    c.t += 100
    rl.acquire()            // 400 more
    assert(c.sleeps.toList == List(500, 400))
  }

  test("retries with linear backoff, then rethrows") {
    val c = new FakeClock
    val rl = new RateLimiter(1000.0, 0, c.now _, c.sleep)
    var calls = 0
    val f = rl.limited[Int, Int](maxRetries = 3, backoffMs = 100) { _ =>
      calls += 1
      if (calls < 3) throw new RuntimeException(s"boom $calls") else 42
    }
    assert(f(1) == 42)
    assert(calls == 3)
    assert(c.sleeps.toList.containsSlice(List(100, 200))) // linear backoff

    calls = 0
    val g = rl.limited[Int, Int](maxRetries = 2, backoffMs = 1) { _ =>
      calls += 1; throw new RuntimeException("always")
    }
    val e = intercept[RuntimeException] { g(1) }
    assert(e.getMessage == "always" && calls == 2)
  }
}
