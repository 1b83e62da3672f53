package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Native watermarked stream–stream interval join — trigger events (e.g.
  * views) matched to outcome events (e.g. purchases) of the same user
  * within a bounded time gap, as ONE continuous query: no store, no
  * foreachBatch — Spark's own symmetric-hash join state does the work.
  *
  * This is the Structured Streaming surface the foreachBatch family
  * deliberately avoids: both sides carry a watermark and the join
  * condition bounds `r_ts` to [l_ts, l_ts + maxGap], so the engine can
  * PROVE when a buffered row can never match again and evict it — state
  * is O(events inside watermark + gap), independent of stream length.
  * Append mode + file sink + checkpoint give exactly-once pair emission
  * across restarts; pairs spanning micro-batch (or run) boundaries join
  * from state exactly like same-batch pairs (spec-pinned against a batch
  * interval join of the concatenated input).
  *
  * Input schema: (event_id LONG, user_id LONG, event_type STRING,
  * tstamp TIMESTAMP, value DOUBLE) — the q81-funnel event shape.
  */
object JoinStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      leftType: String,
      rightType: String,
      maxGap: String,
      watermark: String,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val ev = spark.readStream.schema(schema).parquet(srcDir)
    val left = ev.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("l_id"),
        col("tstamp").as("l_ts"), col("value").as("l_value"))
      .withWatermark("l_ts", watermark)
    val right = ev.filter(col("event_type") === rightType)
      .select(col("user_id").as("__r_user"), col("event_id").as("r_id"),
        col("tstamp").as("r_ts"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    left.join(right,
        col("user_id") === col("__r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGap"))
      .select(col("user_id"), col("l_id"), col("r_id"),
        col("l_ts"), col("r_ts"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts")))
          .as("gap_us"),
        col("l_value"), col("r_value"))
      .writeStream
      .trigger(trigger)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }

  /** The batch reference: the same interval join over a static frame —
    * what the streamed output must equal for in-watermark data. */
  def batchReference(
      events: org.apache.spark.sql.DataFrame,
      leftType: String,
      rightType: String,
      maxGap: String): org.apache.spark.sql.DataFrame = {
    val left = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("l_id"),
        col("tstamp").as("l_ts"), col("value").as("l_value"))
    val right = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("__r_user"), col("event_id").as("r_id"),
        col("tstamp").as("r_ts"), col("value").as("r_value"))
    left.join(right,
        col("user_id") === col("__r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGap"))
      .select(col("user_id"), col("l_id"), col("r_id"),
        col("l_ts"), col("r_ts"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts")))
          .as("gap_us"),
        col("l_value"), col("r_value"))
  }
}
