package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting — two-stage aggregation for hot keys.
  *
  * A single very hot key (one symbol carrying 10% of 100 TB) turns a
  * hash-aggregate exchange into one straggler task. Salting splits each key
  * into `buckets` pseudo-keys for the first (map-heavy) aggregation, then
  * reduces the per-salt partials — both stages get map-side combine, and no
  * reducer sees more than ~1/buckets of the hot key. Semantics-preserving
  * for algebraic aggregates (sum/count/min/max), which is why the salted
  * query oracle-matches the plain SQL aggregate (q41).
  *
  * (AQE's skew-join handling covers joins; this covers aggregation skew,
  * which AQE does not re-plan.)
  */
object Salted {

  /** groupBy(keys) with salted two-stage sum/count over `valueCol`.
    *
    * The salt is a DETERMINISTIC function of the row (hash of the key and
    * value columns — the only ones the aggregate reads, so unhashable
    * bystander columns like maps never break it): any row→salt assignment
    * is algebraically fine for sum/count, but a non-deterministic one
    * (e.g. monotonically_increasing_id) forces Spark to replay the whole
    * stage on partial task loss and blocks reuse/pushdown across it.
    * Rows identical on (keys, value) share a salt — only a corpus that is
    * billions of IDENTICAL (key, value) rows would still skew, and that
    * input is better served by a count-by-value pre-pass than by salting.
    */
  def sumCount(df: DataFrame, keys: Seq[String], valueCol: String,
               buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash((keys :+ valueCol).map(col): _*), lit(buckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__s")).as(s"sum_$valueCol"),
        sum(col("__c")).cast("long").as("n"))
  }
}
