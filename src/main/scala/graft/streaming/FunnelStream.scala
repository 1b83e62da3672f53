package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming windowFunnel — q205's incremental form: per user, the
  * longest view→click→purchase prefix completed in order with every step
  * inside `windowUs` of the chain's FIRST event, maintained across
  * micro-batches with O(1) state per user.
  *
  * State design: the batch recurrence (q205) is two running maxima —
  * the latest view timestamp and the max "anchored-click" view — plus
  * the achieved level. All three are monotone non-decreasing under
  * in-order event application, so the state is THREE longs per user
  * (contrast [[DecayStream]]'s bounded ledger: a funnel needs no
  * history at all, because the optimal chain anchor is always the max
  * over the past — the same monotonicity that lets q205 replace a
  * per-user scan with window maxima).
  *
  * Invariance contract (weaker than DecayStream's any-batching, stated
  * honestly): the fold equals the batch q205 result for every ORDER-
  * RESPECTING batching — each micro-batch may hold any number of
  * events, but no event may arrive in an earlier batch than an event
  * that precedes it in (ts, event_id) order for the same user. That is
  * the append-only log contract; within a batch order is irrelevant
  * (rows are sorted per user before folding). Late arrivals would need
  * the full event buffer a watermark bound would cap — out of scope by
  * contract, as in the reference's cursor-resume ingestion.
  *
  * Scale shape: state is |users| × 3 longs in the state store; each
  * batch shuffles only its own rows by user. The per-user in-batch sort
  * is bounded by per-user batch activity (micro-batches bound it by
  * time).
  */
object FunnelStream {

  case class Ev(userId: Long, tsUs: Long, eventId: Long, eventType: String)

  /** maxV/maxAnchor use Long.MinValue as "none". */
  case class FunnelState(maxV: Long, maxAnchor: Long, level: Int)

  case class LevelUpdate(userId: Long, level: Long)

  def updates(events: Dataset[Ev], windowUs: Long): Dataset[LevelUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, LevelUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[FunnelState]) =>
          var st = state.getOption
            .getOrElse(FunnelState(Long.MinValue, Long.MinValue, 0))
          // per-user in-batch sort: the fold needs (ts, event_id) order;
          // cross-batch order is the caller's append-only contract
          rows.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
            e.eventType match {
              case "view" =>
                st = st.copy(maxV = math.max(st.maxV, e.tsUs),
                  level = math.max(st.level, 1))
              case "click" =>
                if (st.maxV != Long.MinValue && e.tsUs <= st.maxV + windowUs)
                  st = st.copy(maxAnchor = math.max(st.maxAnchor, st.maxV),
                    level = math.max(st.level, 2))
              case "purchase" =>
                if (st.maxAnchor != Long.MinValue &&
                    e.tsUs <= st.maxAnchor + windowUs)
                  st = st.copy(level = 3)
              case _ => ()
            }
          }
          state.update(st)
          Iterator(LevelUpdate(user, st.level.toLong))
      }
  }
}
