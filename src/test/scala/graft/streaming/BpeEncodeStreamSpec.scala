package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.TestSpark

/** Streaming encode composed onto the maintained word store: each
  * micro-batch folds counts, retrains over the CURRENT store, and
  * encodes its own documents with the resulting merges. Pins:
  *   - final-batch documents carry exactly the BATCH path's encoding
  *     (from-scratch train over the full corpus → encode), because the
  *     store has absorbed everything by then;
  *   - earlier documents keep the tokenizer AS OF their arrival
  *     (encoded with batch-1-only merges — the no-history-rewrite
  *     production convention, pinned explicitly, not left implicit);
  *   - checkpointed catch-up across separate runs (the 21-stream
  *     convention) and replay-as-no-op.
  */
class BpeEncodeStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  private val batch1 = Seq(1L -> "low lower lowest", 2L -> "new newer news")
  private val batch2 = Seq(3L -> "wider wide new", 4L -> "lower low newer")

  private def wordsOf(rs: Seq[(Long, String)]) =
    rs.toDF("doc_id", "text")
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))

  test("streamed encode: final batch == batch path; history is as-of; replay no-op") {
    val root = java.nio.file.Files.createTempDirectory("bpeenc").toString
    val src = s"$root/src"; val store = s"$root/store"
    val enc = s"$root/enc"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    def land(rs: Seq[(Long, String)], name: String): Unit = {
      val stage = s"$root/stage_$name"
      rs.toDF("doc_id", "text").coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }
    def run(): Unit = {
      val q = BpeStream.startEncode(spark, src, schema, "doc_id", "text",
        store, enc, ckpt, rounds = 3)
      q.awaitTermination()
    }

    land(batch1, "b1"); run()   // catch-up run 1
    land(batch2, "b2"); run()   // catch-up run 2 from the checkpoint

    val streamed = BpeStream.encoded(spark, enc, "doc_id")
      .as[(Long, String)].collect().toMap
    assert(streamed.keySet === Set(1L, 2L, 3L, 4L))

    // final-batch docs: the store held the FULL corpus when batch 2
    // retrained, so its merges — and therefore these encodings — equal
    // the from-scratch batch path's
    val (finalMerges, _) = graft.ops.BpeTrain.train(
      wordsOf(batch1 ++ batch2), "w", "cnt", rounds = 3)
    val batchEnc = batch2.toDF("doc_id", "text")
      .select($"doc_id", BpeStream.encodeText($"text", finalMerges).as("e"))
      .as[(Long, String)].collect().toMap
    batch2.foreach { case (id, _) => assert(streamed(id) === batchEnc(id)) }

    // earlier docs: encoded with the tokenizer AS OF batch 1
    val (b1Merges, _) = graft.ops.BpeTrain.train(
      wordsOf(batch1), "w", "cnt", rounds = 3)
    val asOfEnc = batch1.toDF("doc_id", "text")
      .select($"doc_id", BpeStream.encodeText($"text", b1Merges).as("e"))
      .as[(Long, String)].collect().toMap
    batch1.foreach { case (id, _) => assert(streamed(id) === asOfEnc(id)) }
    // and the two tokenizers genuinely differ on this corpus — the
    // as-of pin is not vacuous
    assert(b1Merges !== finalMerges)

    // replay with no new files: both stores unchanged
    val encRows = spark.read.parquet(enc).count()
    val storeRows = spark.read.parquet(store).count()
    run()
    assert(spark.read.parquet(enc).count() === encRows)
    assert(spark.read.parquet(store).count() === storeRows)
    assert(BpeStream.encoded(spark, enc, "doc_id")
      .as[(Long, String)].collect().toMap === streamed)
  }
}
