package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming sessionization — the continuous form of q29_session_window,
  * built on Spark's NATIVE streaming session windows: `session_window` +
  * event-time watermark in Append mode. The state store holds one open
  * (possibly merging) window per (key, session); a session is emitted to
  * the sink exactly once, when the watermark passes its close (end + gap
  * already folded into the window by Spark), so late rows inside the
  * lateness horizon MERGE into their open session instead of fragmenting
  * it — the failure mode of naive per-batch sessionization.
  *
  * Streamed ≡ batch: the emitted rows are identical to running the same
  * `session_window` aggregate over the concatenated input in one batch
  * query (SessionStreamSpec pins this over multi-batch, late-merge, and
  * replay scenarios), because window merging is associative — how the
  * stream is chopped cannot change the final merged windows, only WHEN
  * they close.
  *
  * At scale: state is one aggregate row per OPEN session (keys shard
  * across executors); closed sessions leave the store the batch their
  * watermark expires. The file sink + checkpoint give exactly-once
  * emission — a replayed batch is a no-op, same discipline as
  * [[IncrementalIngest]].
  */
object SessionStream {

  /** Start the session aggregate `srcDir → outDir` (parquet in/out).
    * Emits (key, session_start, session_end, n_events, sum_value) per
    * closed session.
    */
  def start(spark: SparkSession, srcDir: String, schema: StructType,
            keyCol: String, tsCol: String, valueCol: String,
            gap: String, lateness: String,
            outDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val in = spark.readStream.schema(schema).parquet(srcDir)
    sessionAgg(in, keyCol, tsCol, valueCol, gap, lateness)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }

  /** The aggregate itself — shared by the stream above and the spec's
    * batch-reference run (watermark is a no-op on a batch DataFrame).
    */
  def sessionAgg(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, gap: String,
                 lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(col(keyCol),
        session_window(col(tsCol), gap).as("__w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("sum_value"))
      .select(col(keyCol),
        col("__w.start").as("session_start"),
        col("__w.end").as("session_end"),
        col("n_events"), col("sum_value"))
}
