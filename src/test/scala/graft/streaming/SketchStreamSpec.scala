package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.TestSpark

/** Incremental HLL sketch store: streamed-over-any-split estimates ≡
  * one-shot batch sketch; duplicates across batches are idempotent;
  * replay is a no-op; untouched keys never rewritten.
  */
class SketchStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("day", StringType, nullable = false),
    StructField("user", LongType, nullable = false)))

  // day d1: users 1..40 split across batches with overlap (dups are
  // idempotent); day d2 only in batch 1; day d3 only in batch 2
  private val batch1 =
    (1L to 25L).map(("d1", _)) ++ (100L to 120L).map(("d2", _))
  private val batch2 =
    (20L to 40L).map(("d1", _)) ++ (500L to 509L).map(("d3", _))

  private def est(df: org.apache.spark.sql.DataFrame) =
    df.select($"day", $"estimate".cast("long"))
      .as[(String, Long)].collect().toMap

  test("streamed estimates == one-shot batch; dup rows idempotent; replay no-op; untouched keys not rewritten") {
    val root = java.nio.file.Files.createTempDirectory("sketchstream").toString
    val src = s"$root/src"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    def land(rs: Seq[(String, Long)], name: String): Unit = {
      val stage = s"$root/stage_$name"
      rs.toDF("day", "user").coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }
    def run(): Unit = {
      val q = SketchStream.start(spark, src, schema, Seq("day"), "user",
        store, ckpt)
      q.awaitTermination()
    }

    land(batch1, "b1"); run()
    land(batch2, "b2"); run()

    val streamed = est(SketchStream.estimates(spark, store, Seq("day")))
    val oneShot = est((batch1 ++ batch2).toDF("day", "user")
      .groupBy($"day").agg(hll_sketch_estimate(
        hll_sketch_agg($"user")).as("estimate")))
    assert(streamed === oneShot)
    // these cardinalities sit in HLL's exact (sparse) regime
    assert(streamed === Map("d1" -> 40L, "d2" -> 21L, "d3" -> 10L))

    // d2 was only touched by batch 0: exactly one version row exists
    val d2Versions = spark.read.parquet(store)
      .filter($"day" === "d2").select($"__v").as[Long].collect().toSeq
    assert(d2Versions === Seq(0L))

    // replay with no new files: nothing appended, estimates unchanged
    val nRows = spark.read.parquet(store).count()
    run()
    assert(spark.read.parquet(store).count() === nRows)
    assert(est(SketchStream.estimates(spark, store, Seq("day"))) === streamed)
  }
}
