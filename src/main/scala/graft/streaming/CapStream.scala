package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming user-contribution counter — q325's incremental form: the
  * per-user event count maintained across micro-batches (the state a
  * privacy-aware pipeline needs to ENFORCE a contribution cap at ingest
  * time, where the batch q325 only audits it after the fact).
  *
  * State design: one long per user. Counting is the fully-commutative
  * algebraic merge, so — unlike [[DebounceStream]]'s order-sensitive
  * stride fold — ANY batching of the log, in ANY order, resolves to the
  * same final counts; the spec still drives split + restart schedules to
  * pin the checkpoint/idempotence machinery, not the algebra.
  *
  * [[curve]] is the q325 aggregation over a counts snapshot: the 6-cap
  * spine explodes the |users|-row aggregate (never re-scans the log),
  * so streamed counts feed the identical audit the batch query runs —
  * the streamed ≡ batch contract is checked end-to-end on the CURVE,
  * not just the raw counts.
  *
  * Scale shape: state is |users| × 1 long; each batch shuffles only its
  * own rows by user; emission is one row per user TOUCHED in the batch
  * (quiet users are never re-emitted — consumers keep-last by user).
  */
object CapStream {

  case class Ev(userId: Long, eventId: Long)

  case class CntState(cnt: Long)

  case class CntUpdate(userId: Long, cnt: Long)

  def updates(evs: Dataset[Ev]): Dataset[CntUpdate] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.userId)
      .flatMapGroupsWithState[CntState, CntUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[CntState]) =>
          val prev = state.getOption.getOrElse(CntState(0L)).cnt
          val n = prev + rows.size
          state.update(CntState(n))
          Iterator(CntUpdate(uid, n))
      }
  }

  /** The q325 cap-curve aggregation over a per-user counts frame
    * (`userId`, `cnt`): rows kept under Σ min(cnt, cap), users clipped,
    * retention ppm — one pass over the collapsed counts.
    */
  def curve(counts: DataFrame, caps: Seq[Long]): DataFrame = {
    counts
      .withColumn("cap", explode(lit(caps.toArray)))
      .groupBy(col("cap"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("cnt") > col("cap"), 1L).otherwise(0L))
          .as("n_clipped"),
        sum(least(col("cnt"), col("cap"))).as("rows_kept"),
        sum(col("cnt")).as("rows_total"))
      .select(col("cap"), col("n_users"), col("n_clipped"),
        col("rows_kept"),
        // greatest(): updates() can't emit a zero-total snapshot, but
        // curve is a public helper over ANY counts frame (house q337/q343
        // degenerate-input convention)
        expr("(rows_kept * 1000000) div greatest(rows_total, 1)")
          .as("kept_ppm"))
      .orderBy(col("cap"))
  }
}
