package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Streaming curation: per-batch quality gate + decontamination must
  * match the batch-mode reference, across two checkpointed catch-up runs,
  * with replay absorbed by determinism.
  */
class CurationStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodText = (1 to 60).map(i => s"tok$i").mkString(" ")
  private val benchText =
    "benchmark eval suite passage shared verbatim across corpus and test set"

  test("streamed curation == batch curate; contaminated and low-quality dropped; replay idempotent") {
    val root = java.nio.file.Files.createTempDirectory("curation").toString
    val src = s"$root/src"; val acc = s"$root/accepted"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = false)))

    val bench = Seq(0L).toDF("bid")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.HashExpressions.hash60Array(
          graft.functions.TextFunctions.shingles(
            org.apache.spark.sql.functions.lit(benchText), 5))).as("__h"))
      .distinct()

    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$root/stage_$name"
      df.coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }
    def run(): Unit = {
      val q = CurationStream.start(spark, src, schema, "doc_id", "text",
        bench, acc, ckpt, minQuality = 0.5, Trigger.AvailableNow())
      q.awaitTermination()
    }

    val b1 = Seq(
      (1L, goodText),                                    // accepted
      (2L, "spam spam spam spam spam spam spam spam"),   // low quality
      (3L, s"prefix words then $benchText trailing")     // contaminated
    ).toDF("doc_id", "text")
    land(b1, "batch1"); run()

    val got1 = spark.read.parquet(acc).select("doc_id")
      .as[Long].collect().toSet
    assert(got1 === Set(1L))
    // streamed result == the batch-mode operator on the same input
    val ref = CurationStream.curate(b1, "doc_id", "text", bench, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(ref === got1)

    // batch 2: another good doc + re-delivery of doc 1
    land(Seq((1L, goodText), (4L, goodText + " plus extra fresh material"))
      .toDF("doc_id", "text"), "batch2")
    run()
    val all = spark.read.parquet(acc).select("doc_id").as[Long].collect().toSeq
    assert(all.sorted === Seq(1L, 1L, 4L),
      "replayed row re-appends identically; reader-side distinct() absorbs it")
    assert(spark.read.parquet(acc).distinct().count() === 2)

    // quality column travels with the accepted rows
    assert(spark.read.parquet(acc).columns.toSet ===
      Set("doc_id", "text", "quality"))
  }
}
