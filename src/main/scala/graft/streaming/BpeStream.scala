package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.ops.{BpeTrain, Dedup}

/** Incrementally-maintained word-count store + tokenizer refresh — the
  * streaming producer for q349/q350's trainer: documents stream in, the
  * (word, count) table stays fresh per micro-batch, and a BPE retrain at
  * any moment runs [[graft.ops.BpeTrain]] over the store instead of
  * rescanning the corpus. This is the production tokenizer-maintenance
  * loop: corpus grows continuously, word counts absorb it incrementally,
  * training stays vocabulary-bounded.
  *
  * Counts are additive (commutative + associative but NOT idempotent), so
  * replay safety comes from the [[MvStream]]/[[SketchStream]] versioning
  * discipline: a batch merges against the store AS OF versions
  * `< batchId` — an at-least-once replay re-reads the same pre-batch
  * state and re-appends bit-identical rows — and readers resolve
  * keep-last per word. Untouched words are never read (semi-join prune)
  * or rewritten.
  *
  * Scale shape: per-batch cost is the batch tokenize + |touched words|
  * rows; store size is |vocabulary| regardless of stream length; the
  * retrain sees exactly what a from-scratch batch train over the full
  * corpus would see (spec-pinned merges-equal).
  */
object BpeStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      textCol: String,
      storeDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        processBatch(spark, batch.toDF(), id, textCol, storeDir)
      }
      .start()

  def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      textCol: String,
      storeDir: String): Unit = {
    val bp = batch
      .select(explode(graft.functions.TextFunctions
        .tokens(coalesce(col(textCol), lit("")))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .persist()
    try {
      val merged =
        if (!Files.exists(Paths.get(storeDir))) bp
        else {
          val touched = Dedup.keepLast(
              spark.read.parquet(storeDir).filter(col("__v") < batchId),
              Seq("w"), Seq("__v")).drop("__v")
            .join(bp.select(col("w")), Seq("w"), "left_semi")
          touched.unionByName(bp)
            .groupBy(col("w")).agg(sum(col("cnt")).as("cnt"))
        }
      merged.withColumn("__v", lit(batchId))
        .write.mode("append").parquet(storeDir)
    } finally bp.unpersist()
  }

  /** The live (word, count) table: keep-last per word. */
  def wordCounts(spark: SparkSession, storeDir: String): DataFrame =
    Dedup.keepLast(spark.read.parquet(storeDir), Seq("w"), Seq("__v"))
      .select(col("w"), col("cnt"))

  /** Retrain over the current store — vocabulary-bounded, no corpus
    * rescan; returns the learned merges and final symbol state.
    */
  def trainCurrent(spark: SparkSession, storeDir: String, rounds: Int)
      : (Seq[BpeTrain.Merge], DataFrame) =
    BpeTrain.train(wordCounts(spark, storeDir), "w", "cnt", rounds)
}
