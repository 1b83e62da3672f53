package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch analog of streaming session windows).
  *
  * The reference's hourly re-ingest loop (`run_pipeline.py:92-96`) has no
  * session concept, but the harness `events` table models the general
  * clickstream case (SURVEY.md §2.10). Classic gaps-and-islands: a session
  * starts where the gap to the previous event of the same key exceeds
  * `gapUs`; the session id is the running count of session starts. Two
  * window passes over one shuffle-by-key — the same ordered-run shape as
  * [[AsOf]], so at 100 TB the cost is one exchange + per-key sort.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key) to `df`. `tsUsCol` is a long
    * (micros); `tieBreak` totalizes the ordering within equal timestamps.
    */
  def assign(df: DataFrame, keys: Seq[String], tsUsCol: String,
             tieBreak: Seq[String], gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(tsUsCol) +: tieBreak.map(col)): _*)
    val prev = lag(col(tsUsCol), 1).over(w)
    val isStart = when(prev.isNull || col(tsUsCol) - prev > gapUs, 1).otherwise(0)
    df.withColumn("__start", isStart)
      .withColumn("session_seq",
        sum(col("__start")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__start")
  }

  /** Collapse to one row per session: start/end (micros), event count, value sum. */
  def aggregate(df: DataFrame, keys: Seq[String], tsUsCol: String,
                tieBreak: Seq[String], gapUs: Long, valueCol: String): DataFrame = {
    assign(df, keys, tsUsCol, tieBreak, gapUs)
      .groupBy((keys :+ "session_seq").map(col): _*)
      .agg(
        min(col(tsUsCol)).as("session_start_us"),
        max(col(tsUsCol)).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
  }
}
