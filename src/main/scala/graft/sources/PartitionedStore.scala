package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's at-rest layout — the Spark analog of the reference's
  * ClickHouse DDL semantics (SURVEY.md §1.3):
  *
  *  - `PARTITION BY toYYYYMM(timestamp)`
  *    (`crypto_data_pipeline_clickhouse.py:570,582,594,606`) →
  *    `write.partitionBy("ym")` directory layout; Spark's file index prunes
  *    unreferenced months at read time with zero custom code.
  *  - `ORDER BY (symbol, interval, timestamp)` sparse index (`:543,:571`,
  *    `index_granularity=8192` `:544`) → `repartition(keys)` +
  *    `sortWithinPartitions(sortCols)` so parquet row groups carry tight
  *    min/max stats on the sort keys — the same skipping effect.
  *  - `LowCardinality(String)` (`:445-448`) → parquet dictionary encoding,
  *    automatic.
  *
  * At 100 TB: month × key-hash gives bounded file counts; the sorted layout
  * makes point/range reads on (key, time) touch O(1) row groups.
  */
object PartitionedStore {

  /** Write `df` as a month-partitioned, key-sorted parquet table. */
  def write(
      df: DataFrame,
      tsCol: String,
      sortCols: Seq[String],
      dir: String,
      buckets: Int = 0): Unit = {
    val withYm = df.withColumn("ym", date_format(col(tsCol), "yyyyMM"))
    val shaped =
      if (buckets > 0)
        withYm.repartition(buckets, col("ym") +: sortCols.map(col): _*)
      else withYm
    shaped
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy("ym")
      .parquet(dir)
  }

  /** Read it back; month-range predicates prune directories automatically. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
