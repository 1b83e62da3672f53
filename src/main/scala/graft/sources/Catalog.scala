package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-management + run-log surface — the Spark analog of the reference's
  * DDL batch and pipeline_logs sink (SURVEY.md §2.2 K4/K5):
  *
  *  - `CREATE DATABASE/TABLE IF NOT EXISTS` with engine/key/partition
  *    (`app/src/crypto_data_pipeline_clickhouse.py:529-610`) →
  *    `spark.sql("CREATE TABLE IF NOT EXISTS ... USING parquet ...")` /
  *    idempotent `ensureTable`.
  *  - interval→table-name fan-out `replace('m','min').replace('h','hour')`
  *    (`:560,668`) → [[klineTableName]].
  *  - append-only `pipeline_logs` MergeTree (`run_pipeline.py:60-80`) →
  *    [[RunLog.append]]: append-mode parquet write of one row with a
  *    `current_timestamp()` default (F4).
  */
object Catalog {

  /** `bn_{market}_klines_{interval}` with the reference's unit spelling. */
  def klineTableName(market: String, interval: String): String = {
    val unit = interval.replace("m", "min").replace("h", "hour")
    s"bn_${market}_klines_$unit"
  }

  /** Idempotent table creation over a parquet location (K5). */
  def ensureTable(spark: SparkSession, name: String, schemaDdl: String,
                  location: String, partitionCols: Seq[String] = Seq.empty): Unit = {
    val part =
      if (partitionCols.nonEmpty) s"PARTITIONED BY (${partitionCols.mkString(", ")})"
      else ""
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $name ($schemaDdl)
         |USING parquet $part LOCATION '$location'""".stripMargin)
  }

  object RunLog {
    /** Append one (now(), status, comment) row — at-least-once-safe because
      * downstream readers treat the log as append-only audit (T5).
      */
    def append(spark: SparkSession, dir: String, status: String, comment: String): Unit = {
      import spark.implicits._
      Seq((status, comment)).toDF("status", "comment")
        .withColumn("timestamp", current_timestamp())
        .select("timestamp", "status", "comment")
        .write.mode("append").parquet(dir)
    }

    def read(spark: SparkSession, dir: String): DataFrame =
      spark.read.parquet(dir)
  }
}
