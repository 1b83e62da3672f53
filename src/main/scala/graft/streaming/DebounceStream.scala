package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming stride debounce — q316's incremental form, and the
  * operator q307's contract note promises: keep an event iff it falls
  * at least `strideUs` after the last KEPT event of the same
  * (user, event_type); suppress the rest. This is the last-kept-
  * relative semantics a batch window cannot express (each decision
  * depends on the previous decision), but the per-key state is just
  * THREE longs — last kept timestamp, kept count, total count — so the
  * stream maintains it exactly where batch q316 needs a per-key fold.
  *
  * Invariance contract (FunnelStream's, stated the same way): the fold
  * equals the batch q316 HOF fold for every ORDER-RESPECTING batching
  * of the per-key stream — append-only log semantics; within a batch
  * rows are sorted by (ts, event_id) before folding. Equal-timestamp
  * ties are order-free by construction: a zero gap is always below the
  * stride, so any tie order yields the same kept set.
  *
  * Scale shape: state is |user × type| × 3 longs; each micro-batch
  * shuffles only its own rows by key. The in-batch sort is bounded by
  * per-key batch activity.
  */
object DebounceStream {

  case class Ev(userId: Long, eventType: String, tsUs: Long, eventId: Long)

  /** lastKept uses Long.MinValue as "none". */
  case class DebounceState(lastKept: Long, kept: Long, total: Long)

  case class KeptUpdate(userId: Long, eventType: String,
                        kept: Long, total: Long)

  def updates(events: Dataset[Ev], strideUs: Long): Dataset[KeptUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.userId, e.eventType))
      .flatMapGroupsWithState[DebounceState, KeptUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[Ev],
         state: GroupState[DebounceState]) =>
          var st = state.getOption
            .getOrElse(DebounceState(Long.MinValue, 0L, 0L))
          rows.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
            val keep = st.lastKept == Long.MinValue ||
              e.tsUs - st.lastKept >= strideUs
            st = DebounceState(
              if (keep) e.tsUs else st.lastKept,
              st.kept + (if (keep) 1L else 0L),
              st.total + 1L)
          }
          state.update(st)
          Iterator(KeptUpdate(key._1, key._2, st.kept, st.total))
      }
  }
}
