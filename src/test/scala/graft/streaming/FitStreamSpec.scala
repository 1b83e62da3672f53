package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.TestSpark

/** Online linear probe via mergeable moments: the fit after checkpointed
  * catch-up runs is BIT-IDENTICAL to a from-scratch batch fit over the
  * concatenated corpus (decimal sums are exact — no drift); replay is a
  * no-op; untouched languages never rewritten.
  */
class FitStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = false)))

  private val batch1 = Seq(
    ("en", "the quick brown fox", 19L), ("en", "lazy dog sleeps", 15L),
    ("en", "quick quick fox", 15L), ("de", "der schnelle fuchs", 18L),
    ("de", "ein hund schlaeft", 17L))
  private val batch2 = Seq(
    ("en", "another english doc here", 24L), ("en", "fox dog fox dog", 15L),
    ("fr", "le renard rapide", 16L), ("fr", "un chien dort", 13L),
    ("fr", "le chien le chat", 16L))

  test("streamed fit ≡ batch fit bit-identically; replay no-op; untouched langs not rewritten") {
    val root = java.nio.file.Files.createTempDirectory("fitstream").toString
    val src = s"$root/src"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    def land(rs: Seq[(String, String, Long)], name: String): Unit = {
      val stage = s"$root/stage_$name"
      rs.toDF("lang", "text", "n_chars").coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }
    def run(): Unit = {
      val q = FitStream.start(spark, src, schema, store, ckpt)
      q.awaitTermination()
    }

    land(batch1, "b1"); run()
    land(batch2, "b2"); run()

    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.toSeq.tail.map(String.valueOf)).toMap

    val streamed = asMap(FitStream.fit(
      FitStream.currentMoments(spark, store)).orderBy($"lang"))
    val oneShot = asMap(FitStream.fit(FitStream.moments(FitStream.features(
        (batch1 ++ batch2).toDF("lang", "text", "n_chars"))))
      .orderBy($"lang"))
    assert(streamed === oneShot)
    assert(streamed.keySet === Set("en", "de", "fr"))
    // en has 5 docs with varying features — a real (non-degenerate) fit
    assert(BigDecimal(streamed("en").head) === BigDecimal(5))

    // replay: re-running against the same source files is a no-op
    val before = spark.read.parquet(store).count()
    run()
    assert(spark.read.parquet(store).count() === before)

    // untouched language not rewritten: de only appears in batch1
    val versions = spark.read.parquet(store)
      .groupBy($"lang").agg(countDistinct($"__v").as("nv"))
      .as[(String, Long)].collect().toMap
    assert(versions("de") === 1L)
    assert(versions("en") === 2L)
  }
}
