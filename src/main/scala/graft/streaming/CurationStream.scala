package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.functions.{HashExpressions, TextFunctions => TF}

/** Continuous corpus CURATION: the streaming composition of the batch
  * quality operators — each micro-batch of documents is quality-scored
  * (q37's tokenize-once signal), decontaminated against a broadcast
  * benchmark shingle set (q70's hashed 5-gram overlap), gated, and the
  * survivors appended to the accepted table with their scores.
  *
  * The point this op makes: every batch-mode quality operator lifts into
  * foreachBatch UNCHANGED — the same Column expressions, the same
  * broadcast pattern — so a refetch loop curates arrivals the hour they
  * land instead of re-scanning the corpus (the [[DedupStream]] discipline
  * applied to filtering). Re-delivered batches rewrite identical rows
  * (the score is a pure row function, the benchmark set is fixed), so
  * at-least-once replay is absorbed by a reader-side `distinct()` — the
  * same idempotence-by-determinism story as the dedup stream.
  *
  * At scale: the benchmark shingle table is tiny for every public eval
  * suite → broadcast; the batch is scanned once; nothing shuffles except
  * the append itself.
  */
object CurationStream {

  /** Pure batch transform (also the spec's reference path): score, flag
    * contamination, gate. Returns the accepted rows.
    */
  def curate(batch: DataFrame, idCol: String, textCol: String,
             benchShingleHashes: DataFrame, // one long column "__h"
             minQuality: Double): DataFrame = {
    val scored = batch
      .withColumn("__toks", TF.tokens(col(textCol)))
      .withColumn("quality",
        round(TF.typeTokenRatioOf(col("__toks")) *
          least(lit(1.0), size(col("__toks")).cast("double") / 50.0), 6))
    val hits = scored
      .select(col(idCol), explode(
        HashExpressions.shingleHash60Array(TF.tokens(col(textCol)), 5)).as("__h"))
      .join(broadcast(benchShingleHashes), "__h")
      .select(col(idCol)).distinct()
      .withColumn("contaminated", lit(true))
    scored.join(hits, Seq(idCol), "left")
      .filter(col("contaminated").isNull && col("quality") >= minQuality)
      .drop("__toks", "contaminated")
  }

  /** Start the stream: new parquet files under `srcDir` are curated and
    * the survivors appended to `acceptedDir`.
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      idCol: String,
      textCol: String,
      benchShingleHashes: DataFrame,
      acceptedDir: String,
      checkpointDir: String,
      minQuality: Double,
      trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        curate(batch.toDF(), idCol, textCol, benchShingleHashes, minQuality)
          .write.mode("append").parquet(acceptedDir)
      }
      .start()
}
