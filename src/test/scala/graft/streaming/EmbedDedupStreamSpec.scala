package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Streaming composition of the incremental embedding dedup: batches of
  * vectors arrive as files; each micro-batch dedups against the vector
  * store built by every PRIOR batch, appends its pairs, then joins the
  * store. Pins the loop across two catch-up runs sharing one checkpoint.
  */
class EmbedDedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two-batch streamed embedding dedup: cross-batch dup found, store pairs never re-emitted") {
    val root = java.nio.file.Files.createTempDirectory("embeddedup").toString
    val src = s"$root/src"; val store = s"$root/store"
    val pairs = s"$root/pairs"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType), nullable = true)))

    def run(): Unit = {
      val q = EmbedDedupStream.start(spark, src, schema, "vec_id", "embedding",
        store, pairs, ckpt, Trigger.AvailableNow(), threshold = 0.95)
      q.awaitTermination()
    }
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$root/stage_$name"
      df.coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }

    // batch 1: two distinct vectors + an in-batch duplicate pair (1, 3)
    land(Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding"), "batch1")
    run()
    val p1 = spark.read.parquet(pairs)
      .select($"new_id", $"dup_id").as[(Long, Long)].collect().toSet
    assert(p1 === Set((1L, 3L)))              // in-batch dup, once, id order
    assert(spark.read.parquet(store).count() === 3)

    // batch 2: a re-delivery of vector 1 (new id) + a genuinely new vector
    land(Seq(
      (10L, Seq(1f, 0f, 0f, 0f)),
      (11L, Seq(0f, 0f, 1f, 0f))
    ).toDF("vec_id", "embedding"), "batch2")
    run()
    val p2 = spark.read.parquet(pairs)
      .select($"new_id", $"dup_id").as[(Long, Long)].collect().toSeq
    // the store-internal (1,3) pair is NOT re-emitted by batch 2: it
    // appears exactly once in the appended log; batch 2 contributes its
    // matches against BOTH store copies
    assert(p2.count(_ == (1L, 3L)) === 1)
    assert(p2.toSet === Set((1L, 3L), (10L, 1L), (10L, 3L)))
    assert(spark.read.parquet(store).count() === 5)
  }
}
