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

  /** Word store + per-batch ENCODE — the inference half composed onto
    * the maintenance loop: each micro-batch (1) folds its word counts
    * into the store ([[processBatch]]), (2) retrains `rounds` merges
    * over the CURRENT store (vocab-bounded, no corpus rescan), and
    * (3) encodes the batch's documents with the resulting merge list —
    * one compiled [[graft.functions.BpeFunctions.BpeEncode]] pass, the
    * narrow shuffle-free map — appending (id, enc, __v = batchId) to
    * `encDir`. Documents keep the encoding of the tokenizer AS OF
    * their arrival (the production convention — re-encoding history on
    * every vocab refresh would be a full-corpus rewrite); once the
    * store has absorbed the whole corpus the last batch's merges equal
    * a from-scratch train (the [[trainCurrent]] equivalence), so the
    * final batch's encodings equal the batch path's — spec-pinned.
    * Replay safety: [[processBatch]]'s idempotent fold re-derives the
    * same pre-batch store state and re-appends identical `__v = batchId`
    * rows, so the POST-batch store [[trainCurrent]] reads is also
    * identical on replay — hence the same merges and bit-identical
    * encode rows; readers resolve keep-last.
    */
  def startEncode(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      idCol: String,
      textCol: String,
      storeDir: String,
      encDir: String,
      checkpointDir: String,
      rounds: Int,
      trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val df = batch.toDF().localCheckpoint(true)
        processBatch(spark, df, id, textCol, storeDir)
        val (merges, _) = trainCurrent(spark, storeDir, rounds)
        df.select(col(idCol),
            encodeText(col(textCol), merges).as("enc"))
          .withColumn("__v", lit(id))
          .write.mode("append").parquet(encDir)
      }
      .start()

  /** Whole-document encoding as one narrow expression: per word the
    * merge-list scan of BpeEncode, syms joined by '|', words by ' ' —
    * the same rendering q354's min/max pins.
    */
  def encodeText(text: org.apache.spark.sql.Column,
                 merges: Seq[BpeTrain.Merge]): org.apache.spark.sql.Column = {
    val m = merges.map(x => (x.symA, x.symB))
    array_join(transform(
      graft.functions.TextFunctions.tokens(coalesce(text, lit(""))),
      w => array_join(graft.functions.BpeFunctions.bpeEncode(w, m), "|")),
      " ")
  }

  /** The live (id → enc) table: keep-last per id (replayed batches
    * re-append identical rows; keep-last collapses them).
    */
  def encoded(spark: SparkSession, encDir: String, idCol: String): DataFrame =
    Dedup.keepLast(spark.read.parquet(encDir), Seq(idCol), Seq("__v"))
      .select(col(idCol), col("enc"))

  /** Retrain over the current store — vocabulary-bounded, no corpus
    * rescan; returns the learned merges and final symbol state.
    */
  def trainCurrent(spark: SparkSession, storeDir: String, rounds: Int)
      : (Seq[BpeTrain.Merge], DataFrame) =
    BpeTrain.train(wordCounts(spark, storeDir), "w", "cnt", rounds)
}
