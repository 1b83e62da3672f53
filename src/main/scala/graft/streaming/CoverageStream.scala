package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming interval-union coverage — q238's incremental form: per key,
  * the union length of half-open activity intervals `[startUs, endUs)`,
  * maintained across micro-batches with O(1) state per key.
  *
  * State design: applied in non-decreasing START order, the union
  * accumulates with the classic sweep identity
  * `covered += max(0, end − max(start, maxEnd))` — every new interval
  * either extends the current covered frontier (`start ≤ maxEnd`) or
  * opens a fresh segment past a gap. So the whole history collapses to
  * FOUR longs per key (frontier `maxEnd`, `coveredUs`, first start `t0`,
  * interval count) — no interval list, no sweep buffer (contrast the
  * batch q238 plan, which sorts ±1 deltas because it sees the intervals
  * unordered).
  *
  * Invariance contract (the [[FunnelStream]] convention, stated
  * honestly): the fold equals the batch union for every batching that
  * respects (startUs, endUs, eventId) order per key — the append-only
  * log contract; within a batch order is irrelevant (rows are sorted per
  * key before folding). An interval arriving with a start EARLIER than
  * the current frontier's history would need the merged-segment list a
  * watermark bound would cap — out of scope by contract, as in the
  * reference's cursor-resume ingestion.
  *
  * Scale shape: state is |keys| × 4 longs in the state store; each batch
  * shuffles only its own rows by key; the per-key in-batch sort is
  * bounded by per-key batch activity.
  */
object CoverageStream {

  case class Iv(key: String, startUs: Long, endUs: Long, eventId: Long)

  /** maxEnd uses Long.MinValue as "none"; t0 Long.MaxValue as "none". */
  case class CovState(maxEnd: Long, coveredUs: Long, t0: Long, n: Long)

  case class CovUpdate(key: String, nIntervals: Long, coveredUs: Long,
                       spanUs: Long)

  def updates(ivs: Dataset[Iv]): Dataset[CovUpdate] = {
    import ivs.sparkSession.implicits._
    ivs.groupByKey(_.key)
      .flatMapGroupsWithState[CovState, CovUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Iv], state: GroupState[CovState]) =>
          var st = state.getOption
            .getOrElse(CovState(Long.MinValue, 0L, Long.MaxValue, 0L))
          rows.toSeq.sortBy(i => (i.startUs, i.endUs, i.eventId))
            .foreach { iv =>
              if (iv.endUs > iv.startUs) {   // degenerate intervals: no-op
                val from = math.max(iv.startUs, st.maxEnd)
                st = CovState(
                  maxEnd = math.max(st.maxEnd, iv.endUs),
                  coveredUs = st.coveredUs + math.max(0L, iv.endUs - from),
                  t0 = math.min(st.t0, iv.startUs),
                  n = st.n + 1)
              }
            }
          state.update(st)
          if (st.n == 0) Iterator.empty
          else Iterator(CovUpdate(key, st.n, st.coveredUs,
            st.maxEnd - st.t0))
      }
  }
}
