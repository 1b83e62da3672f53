package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.TestSpark

/** Incremental word-count store + BPE refresh: streamed counts over
  * checkpointed catch-up runs ≡ one-shot batch counts; the retrain over
  * the store learns the SAME merges a from-scratch train over the full
  * corpus learns; replay is a no-op; untouched words never rewritten.
  */
class BpeStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("text", StringType, nullable = true)))

  private val batch1 = Seq("low lower lowest", "new newer news", "low low")
  private val batch2 = Seq("wider wide new", "lower low newer")

  test("streamed ≡ batch counts; retrain ≡ from-scratch train; replay no-op; untouched words not rewritten") {
    val root = java.nio.file.Files.createTempDirectory("bpestream").toString
    val src = s"$root/src"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    def land(rs: Seq[String], name: String): Unit = {
      val stage = s"$root/stage_$name"
      rs.toDF("text").coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }
    def run(): Unit = {
      val q = BpeStream.start(spark, src, schema, "text", store, ckpt)
      q.awaitTermination()
    }

    land(batch1, "b1"); run()
    land(batch2, "b2"); run()

    val streamed = BpeStream.wordCounts(spark, store)
      .as[(String, Long)].collect().toMap
    val oneShot = (batch1 ++ batch2).toDF("text")
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    assert(streamed === oneShot)

    // retrain over the store == from-scratch train over the concatenated
    // corpus (same argmax choices, same weights)
    val (fromStore, _) = BpeStream.trainCurrent(spark, store, rounds = 3)
    val (fromScratch, _) = graft.ops.BpeTrain.train(
      (batch1 ++ batch2).toDF("text")
        .select(explode(graft.functions.TextFunctions.tokens($"text")).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("cnt")),
      "w", "cnt", rounds = 3)
    assert(fromStore === fromScratch)
    assert(fromStore.nonEmpty)

    // replay: re-running against the same source files is a no-op
    val before = spark.read.parquet(store).count()
    run()
    assert(spark.read.parquet(store).count() === before)

    // untouched words not rewritten: a word only in batch1 and absent
    // from batch2 must have exactly ONE store version
    val versionsPerWord = spark.read.parquet(store)
      .groupBy($"w").agg(countDistinct($"__v").as("nv"))
      .as[(String, Long)].collect().toMap
    assert(versionsPerWord("lowest") === 1L)   // batch1-only word
    assert(versionsPerWord("low") === 2L)      // touched by both batches
  }
}
