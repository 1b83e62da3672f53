package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Streaming composition of the signature store: batches of documents
  * arrive as files; each micro-batch dedups against the store built by
  * every PRIOR batch, appends its pairs, then joins the store. Pins the
  * end-to-end loop across two catch-up runs sharing one checkpoint.
  */
class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two-batch streamed dedup: cross-batch pairs found, store text read once, old pairs never re-emitted") {
    val root = java.nio.file.Files.createTempDirectory("dedupstream").toString
    val src = s"$root/src"; val store = s"$root/store"
    val pairs = s"$root/pairs"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = false)))

    def run(): Unit = {
      val q = DedupStream.start(spark, src, schema, "doc_id", "text",
        store, pairs, ckpt, Trigger.AvailableNow(), threshold = 0.3)
      q.awaitTermination()
    }
    // The file stream source lists srcDir non-recursively: land each
    // batch's part files flat in srcDir (stage elsewhere, then move).
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$root/stage_$name"
      df.coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }

    // batch 1
    land(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different words about spark engines and parquet files")
    ).toDF("doc_id", "text"), "batch1")
    run()
    val store1 = spark.read.parquet(store)
    assert(store1.count() == 2 &&
      store1.columns.toSet == Set("doc_id", "n", "th", "sig"))
    // pairsDir may not exist if batch1 had no pairs — that's the expected
    // state here (the two docs are unrelated)
    assert(!new java.io.File(pairs).exists() ||
      spark.read.parquet(pairs).isEmpty)

    // batch 2: re-delivery of doc 1 + a mutation + an unrelated doc
    land(Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "the quick brown fox jumps over the lazy cat again and again"),
      (12L, "unrelated fresh content mentioning neither foxes nor engines today")
    ).toDF("doc_id", "text"), "batch2")
    run()

    val got = spark.read.parquet(pairs)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    val keys = got.map(p => (p._1, p._2)).toSet
    assert(got.find(p => p._1 == 1L && p._2 == 10L).exists(_._3 == 1.0),
      s"re-delivered exact dup must pair with jaccard 1, got $got")
    assert(keys.contains((1L, 11L)), "mutated doc pairs with the stored original")
    assert(keys.contains((10L, 11L)), "within-batch pair")
    assert(!keys.contains((1L, 2L)), "old×old never emitted")
    assert(!keys.exists(p => p._1 == 12L || p._2 == 12L))
    // store now carries all five signatures; a third empty run is a no-op
    assert(spark.read.parquet(store).count() == 5)
    run()
    assert(spark.read.parquet(pairs).count() == got.size)
  }
}
