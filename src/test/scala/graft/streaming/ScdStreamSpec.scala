package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.TestSpark
import graft.ops.Scd

/** Streaming SCD Type-2 maintenance: per-batch interval extension over a
  * persisted dimension ≡ a from-scratch batch rebuild of the full log
  * (batch boundaries invisible), with the late-row horizon enforced.
  */
class ScdStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("tier", StringType, nullable = false)))

  test("two catch-up runs == one batch rebuild; open rows close incrementally; late rows dropped") {
    val root = java.nio.file.Files.createTempDirectory("scdstream").toString
    val src = s"$root/src"; val dim = s"$root/dim"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    def run(): Unit = {
      val q = ScdStream.start(spark, src, schema, Seq("k"), "ts", Seq("tier"),
        dim, ckpt, Trigger.AvailableNow())
      q.awaitTermination()
    }
    def land(rows: Seq[(Long, Long, String)], name: String): Unit = {
      val stage = s"$root/stage_$name"
      rows.toDF("k", "ts", "tier").coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }
    def view() = ScdStream.currentView(spark, dim, Seq("k"))
      .select("k", "tier", "valid_from", "valid_to", "is_current")
      .orderBy("k", "valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq

    val b1 = Seq((1L, 10L, "gold"), (1L, 20L, "gold"), (2L, 15L, "basic"))
    land(b1, "b1")
    run()
    assert(view() === Seq(
      (1L, "gold", 10L, None, true), (2L, "basic", 15L, None, true)))

    // batch 2: change for k=1 (closes the open row), unchanged re-delivery
    // for k=2 (compressed away), a brand-new key, and a LATE row for k=2
    // at ts=5 (before its open valid_from=15 — dropped by the horizon)
    val b2 = Seq((1L, 30L, "silver"), (2L, 40L, "basic"), (3L, 35L, "gold"),
      (2L, 5L, "late-ignored"))
    land(b2, "b2")
    run()
    val got = view()
    assert(got === Seq(
      (1L, "gold", 10L, Some(30L), false),
      (1L, "silver", 30L, None, true),
      (2L, "basic", 15L, None, true),
      (3L, "gold", 35L, None, true)))

    // batch-boundary invisibility: the streamed view equals a from-scratch
    // Scd.buildType2 over the concatenated in-horizon log
    val full = Scd.buildType2(
        (b1 ++ b2.filterNot(_._3 == "late-ignored")).toDF("k", "ts", "tier"),
        Seq("k"), "ts", Seq("tier"))
      .select("k", "tier", "valid_from", "valid_to", "is_current")
      .orderBy("k", "valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(got === full)

    // closed history is never rewritten: k=1's closed row carries the
    // batch-2 version, but a batch-3 change for k=3 must not re-append
    // k=1 rows at all
    val before = spark.read.parquet(dim)
      .filter($"k" === 1L).count()
    land(Seq((3L, 50L, "silver")), "b3")
    run()
    val after = spark.read.parquet(dim)
      .filter($"k" === 1L).count()
    assert(before === after)
    assert(view().filter(_._1 == 3L) === Seq(
      (3L, "gold", 35L, Some(50L), false), (3L, "silver", 50L, None, true)))
  }
}
