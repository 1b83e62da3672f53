package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Columnar CDC apply: collapse an insert/update/delete changelog into its
  * final snapshot in ONE algebraic aggregation — no window, no per-key sort.
  *
  * Semantics (Debezium-style upsert log — the general form of the
  * reference's ReplacingMergeTree keep-latest-version collapse,
  * `app/src/crypto_data_pipeline_clickhouse.py:541,567`, extended with
  * tombstones and partial-column updates):
  *   - ops are ordered per key by `seq` (pass a `struct(...)` for composite
  *     sequence numbers; per-key uniqueness is the caller's contract);
  *   - `D` tombstones the key — the key is absent from the snapshot iff its
  *     LAST op is `D`, and earlier writes never survive a tombstone;
  *   - `I` (re)initializes EVERY payload column, nulls included (a null in
  *     an `I` row resets that column to null);
  *   - `U` is a PARTIAL update: only its non-null payload columns overwrite.
  *
  * Each payload column therefore resolves independently to the value of the
  * latest row that WRITES it (`I`, or `U` with the column non-null) — but
  * only if that write landed after the key's last tombstone.
  *
  * Scale shape: everything is `max`-of-struct aggregates, so partial
  * aggregation combines map-side and the whole apply is one key shuffle with
  * k-independent state per key. A key with a million-row history costs one
  * combiner chain, never a sort; the same algebra makes the op replayable as
  * a streaming `foreachBatch` merge (state row = the agg struct).
  */
object Cdc {

  /** Apply changelog `log` and return the live snapshot:
    * `keyCols ++ payload`, one row per key whose last op is not `D`.
    *
    * @param log     changelog rows
    * @param keyCols entity key columns
    * @param seq     per-key total order (unique per key; struct() for ties)
    * @param op      "I" | "U" | "D"
    * @param payload payload column names resolved independently
    */
  def applyLog(log: DataFrame, keyCols: Seq[String], seq: Column, op: Column,
               payload: Seq[String]): DataFrame = {
    val writes = payload.map { c =>
      // a write to c = full init, or a partial update that mentions c
      max(when(op === "I" || col(c).isNotNull,
        struct(seq.as("s"), col(c).as("v")))).as(s"__w_$c")
    }
    val aggs =
      max(when(op === "D", seq)).as("__lastD") +:
        max(struct(seq.as("s"), op.as("o"))).as("__last") +:
        writes
    log.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("__last").getField("o") =!= "D")
      .select(keyCols.map(col) ++ payload.map { c =>
        // survive only if the latest write postdates the last tombstone
        when(col("__lastD").isNull ||
          col(s"__w_$c").getField("s") > col("__lastD"),
          col(s"__w_$c").getField("v")).as(c)
      }: _*)
  }
}
