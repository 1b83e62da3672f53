package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class PaginatorSpec extends AnyFunSuite {

  // fake source: one row per ms in [0, 2500]
  private def fakeFetch(rows: Range)(cursor: Long, end: Long, limit: Int): Seq[Long] =
    rows.filter(t => t >= cursor && t <= end).take(limit).map(_.toLong)

  test("cursor pagination: resumes at last_ts+1, stops on short page, full coverage") {
    val got = Paginator.fetchRange(0L, 2500L, 1000)(fakeFetch(0 to 2500))(identity)
    assert(got === (0L to 2500L).toVector)          // nothing skipped, nothing doubled
  }

  test("empty source -> empty result (P9 guard)") {
    assert(Paginator.fetchRange(0L, 100L, 10)((_, _, _) => Seq.empty[Long])(identity).isEmpty)
  }

  test("gap past the end stops the loop") {
    // rows only up to 50, window to 1000: one short page then done
    val got = Paginator.fetchRange(0L, 1000L, 100)(fakeFetch(0 to 50))(identity)
    assert(got === (0L to 50L).toVector)
  }

  test("delivery-date clamp (P8)") {
    assert(Paginator.clampEnd(1000L, Some(800L)) === 800L)
    assert(Paginator.clampEnd(1000L, Some(1200L)) === 1000L)
    assert(Paginator.clampEnd(1000L, None) === 1000L)
  }

  test("-1102 means empty (S7); ban-until parse (F7)") {
    assert(Paginator.isEmptyResultCode(-1102))
    assert(!Paginator.isEmptyResultCode(-1100))
    assert(Paginator.parseBanUntil("Way too many requests; banned until 1700000000123.") ===
      Some(1700000000123L))
    assert(Paginator.parseBanUntil("some other error") === None)
  }

  test("retry: succeeds after transient failures with exponential backoff") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val out = Paginator.retry(3, 4L, 10L, sleeps.append(_)) { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(out === 42 && calls === 3)
    assert(sleeps.toSeq === Seq(4L, 8L))
    // exhausted attempts rethrow
    intercept[RuntimeException] {
      Paginator.retry(2, 1L, 2L, _ => ())(() => throw new RuntimeException("always"))
    }
  }

  test("rate gate: over-budget calls block until the window rolls (deterministic clock)") {
    var now = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val gate = new Paginator.RateGate(maxCalls = 2, periodMs = 1000L,
      clock = () => now, sleep = ms => { sleeps.append(ms); now += ms })
    gate.acquire(); gate.acquire()          // budget of the first window
    assert(sleeps.isEmpty)
    gate.acquire()                          // third call must wait out the window
    assert(sleeps.toSeq === Seq(1000L) && now === 1000L)
    gate.acquire()                          // second slot of the new window: free
    assert(sleeps.size === 1)
    gate.acquire()                          // and over budget again
    assert(sleeps.toSeq === Seq(1000L, 1000L))
  }

  test("rate gate is shared across threads: concurrent calls never exceed the budget") {
    val gate = new Paginator.RateGate(maxCalls = 1000, periodMs = 600000L)
    val inWindow = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => (1 to 100).foreach { _ =>
        gate.throttled { inWindow.incrementAndGet() }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // 800 calls fit the 1000-call budget: none should have slept (a sleep
    // here would deadlock-ish stall the test for 10 minutes — finishing at
    // all proves no thread was wrongly blocked, and the count proves every
    // acquisition was granted exactly once)
    assert(inWindow.get() === 800)
  }
}
