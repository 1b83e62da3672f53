package graft.sources

import scala.annotation.tailrec

/** The reference's paginated-fetch control flow (SURVEY.md §2.1 S5–S7),
  * extracted as pure, engine-adjacent logic. The network call is a plugged
  * function (zero egress here; any REST/JDBC pager slots in); everything
  * the reference does around it is reproduced and unit-tested:
  *
  *  - cursor loop "while end ≥ cursor, resume from last_ts + 1"
  *    (`app/src/crypto_data_pipeline_clickhouse.py:275-289`;
  *    `additional_data.py:79-84,198-203`)
  *  - window clamp by delivery date (P8, `:268-270`)
  *  - "-1102 → empty result" (S7, `additional_data.py:164-165`)
  *  - ban-until extraction from error text (F7, `:91`)
  *  - bounded retry with exponential backoff (§2.11 `@retry`, `:110`)
  */
object Paginator {

  /** Fetch `[startMs, endMs]` in pages. `fetch(cursor, end, limit)` returns
    * rows ordered by `ts`; loop resumes at `last_ts + 1` and stops on an
    * empty or short page. Returns all rows (caller dedups overlaps — the
    * keep-last operator makes re-fetch safe, T4/T5).
    */
  def fetchRange[A](startMs: Long, endMs: Long, pageLimit: Int)
                   (fetch: (Long, Long, Int) => Seq[A])(ts: A => Long): Vector[A] = {
    @tailrec
    def loop(cursor: Long, acc: Vector[A]): Vector[A] = {
      if (cursor > endMs) acc
      else {
        val page = fetch(cursor, endMs, pageLimit)
        if (page.isEmpty) acc
        else {
          val next = ts(page.last) + 1
          if (page.size < pageLimit || next <= cursor) acc ++ page
          else loop(next, acc ++ page)
        }
      }
    }
    loop(startMs, Vector.empty)
  }

  /** Bound the fetch window by an instrument's delivery date (P8). */
  def clampEnd(endMs: Long, deliveryDateMs: Option[Long]): Long =
    deliveryDateMs.fold(endMs)(math.min(endMs, _))

  /** Error code -1102 means "no data for this instrument" → empty page. */
  def isEmptyResultCode(code: Int): Boolean = code == -1102

  private val BanPattern = """banned until (\d+)""".r.unanchored

  /** Extract the ban-expiry epoch-millis from an API error message (F7). */
  def parseBanUntil(errorText: String): Option[Long] = errorText match {
    case BanPattern(ms) => Some(ms.toLong)
    case _ => None
  }

  /** Bounded retry with exponential backoff — the reference's tenacity
    * policy (3 attempts, 4–10 s). `sleep` is injected for testability.
    */
  @tailrec
  def retry[A](attempts: Int, backoffMs: Long, maxBackoffMs: Long = 10000L,
               sleep: Long => Unit = Thread.sleep)(f: () => A): A =
    scala.util.Try(f()) match {
      case scala.util.Success(a) => a
      case scala.util.Failure(e) if attempts <= 1 => throw e
      case scala.util.Failure(_) =>
        sleep(math.min(backoffMs, maxBackoffMs))
        retry(attempts - 1, math.min(backoffMs * 2, maxBackoffMs), maxBackoffMs, sleep)(f)
    }

  /** Shared fixed-window rate gate — the reference's `@limits(calls, period)
    * @sleep_and_retry` decorator, which all fetch workers share ONE instance
    * of (`crypto_data_pipeline_clickhouse.py:190-214`: the module-level
    * limiter gates every thread in the pool). At most `maxCalls` acquisitions
    * per `periodMs` window across all threads; an over-budget caller blocks
    * until the window rolls. Clock and sleep are injected so specs run
    * deterministically at zero wall-clock.
    */
  final class RateGate(
      maxCalls: Int, periodMs: Long,
      // Only intervals are compared, so the default clock is MONOTONIC
      // (nanoTime): a backward wall-clock step (NTP) under
      // currentTimeMillis would freeze the window and block every caller
      // until the clock caught back up.
      clock: () => Long = () => System.nanoTime() / 1000000L,
      sleep: Long => Unit = Thread.sleep) {
    require(maxCalls > 0, s"maxCalls must be positive, got $maxCalls")
    require(periodMs > 0, s"periodMs must be positive, got $periodMs")
    // one period in the past: the first acquire() always opens a fresh
    // window (a Long.MinValue sentinel would overflow `now - windowStart`)
    private[this] var windowStart = clock() - periodMs
    private[this] var used = 0

    /** Block until a call slot is free in the current window, then take it. */
    @tailrec def acquire(): Unit = {
      val waitMs = synchronized {
        val now = clock()
        if (now - windowStart >= periodMs) { windowStart = now; used = 0 }
        if (used < maxCalls) { used += 1; 0L }
        else windowStart + periodMs - now
      }
      if (waitMs > 0) { sleep(waitMs); acquire() }
    }

    /** Run `f` under the gate (the decorator form). */
    def throttled[A](f: => A): A = { acquire(); f }
  }
}
