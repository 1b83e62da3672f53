package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ops.Resample

/** Incrementally-maintained OHLCV materialized view: streamed merge over
  * any batch split/order ≡ from-scratch Resample.ohlcv; batch replay is a
  * no-op; untouched bars are never rewritten.
  */
class MvStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("sym", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("eid", LongType, nullable = false),
    StructField("px", DoubleType, nullable = false)))

  private def ticks(rows: Seq[(String, Long, Long, Double)]) =
    rows.toDF("sym", "s", "eid", "px")
      .select($"sym", timestamp_seconds($"s").as("ts"), $"eid", $"px")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select($"sym", unix_timestamp($"bucket_start").as("b"), $"open",
        $"high", $"low", $"close", $"volume", $"n_ticks")
      .as[(String, Long, Double, Double, Double, Double, Double, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2))

  // out-of-order, multi-bucket, two keys; eid is the tie-break
  private val all = Seq(
    ("A", 10L, 1L, 5.0), ("A", 70L, 2L, 9.0), ("A", 30L, 3L, 2.0),
    ("A", 20L, 4L, 7.0), ("B", 15L, 5L, 1.0), ("B", 65L, 6L, 3.0),
    ("A", 65L, 7L, 4.0), ("B", 5L, 8L, 8.0), ("A", 10L, 9L, 6.0))

  test("streamed merge over catch-up runs == batch resample; replay is a no-op; untouched bars not rewritten") {
    val root = java.nio.file.Files.createTempDirectory("mvstream").toString
    val src = s"$root/src"; val mv = s"$root/mv"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    def run(): Unit = {
      val q = MvStream.start(spark, src, schema, Seq("sym"), "ts",
        Seq("eid"), "px", "1 minute", mv, ckpt, Trigger.AvailableNow())
      q.awaitTermination()
    }
    def land(rows: Seq[(String, Long, Long, Double)], name: String): Unit = {
      val stage = s"$root/stage_$name"
      ticks(rows).coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }

    land(all.take(4), "b1"); run()
    land(all.slice(4, 7), "b2"); run() // includes late data for A's first bar
    land(all.drop(7), "b3"); run()

    val got = canon(MvStream.currentView(spark, mv, Seq("sym")))
    val ref = canon(Resample.ohlcv(ticks(all), Seq("sym"), "ts",
      Seq("eid"), "px", "1 minute"))
    assert(got === ref)
    assert(ref.nonEmpty && ref.map(_._8).sum === all.size.toLong)

    // replaying the LAST batch id must re-merge against pre-batch state
    // and produce bit-identical rows — the view is unchanged
    MvStream.processBatch(spark, ticks(all.drop(7)), batchId = 2L,
      Seq("sym"), "ts", Seq("eid"), "px", "1 minute", mv)
    assert(canon(MvStream.currentView(spark, mv, Seq("sym"))) === ref)

    // bars untouched by b3 (rows 8-9 hit sym B bucket 0 and A bucket 0)
    // keep their earlier version: A's minute-1 bar was finalized in b2
    val vOfA1 = spark.read.parquet(mv)
      .filter($"sym" === "A" && unix_timestamp($"bucket_start") === 60L)
      .agg(max($"__v")).as[Long].head()
    assert(vOfA1 === 1L, "untouched bar must not be rewritten by batch 2")
  }

  test("batch-split invariance: a different split of the same ticks resolves to the same view") {
    val root = java.nio.file.Files.createTempDirectory("mvstream2").toString
    new java.io.File(s"$root/src").mkdirs()
    val splits = Seq(all.take(1), all.slice(1, 6), all.drop(6))
    splits.zipWithIndex.foreach { case (rows, i) =>
      MvStream.processBatch(spark, ticks(rows), batchId = i.toLong,
        Seq("sym"), "ts", Seq("eid"), "px", "1 minute", s"$root/mv")
    }
    val got = canon(MvStream.currentView(spark, s"$root/mv", Seq("sym")))
    val ref = canon(Resample.ohlcv(ticks(all), Seq("sym"), "ts",
      Seq("eid"), "px", "1 minute"))
    assert(got === ref)
  }
}
