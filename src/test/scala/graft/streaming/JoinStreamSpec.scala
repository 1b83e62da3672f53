package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.TestSpark

/** Native stream–stream interval join: streamed pairs ≡ batch interval
  * join of the concatenated input; pairs spanning batch boundaries join
  * from state; out-of-gap pairs never emit; rerun on a shared checkpoint
  * appends nothing new (exactly-once file sink).
  */
class JoinStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("tstamp", TimestampType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(min: Long) = new Timestamp(t0.getTime + min * 60000L)

  // batch 1: u1 view + in-gap purchase; u2 view + OUT-of-gap purchase
  //          (2h > 1h); u4 view only (its purchase lands in batch 2)
  private val batch1 = Seq(
    (1L, 1L, "view", at(0), 1.0),
    (2L, 1L, "purchase", at(30), 10.0),
    (3L, 2L, "view", at(0), 1.0),
    (4L, 2L, "purchase", at(120), 20.0),
    (5L, 4L, "view", at(10), 1.0))
  // batch 2: u1 second in-gap purchase; u4's purchase 40min after its
  //          batch-1 view (cross-batch pair); u3 purchase with no view
  private val batch2 = Seq(
    (6L, 1L, "purchase", at(50), 11.0),
    (7L, 4L, "purchase", at(50), 12.0),
    (8L, 3L, "purchase", at(5), 9.0))

  test("streamed == batch interval join; cross-batch pairs; rerun no-op") {
    val root = java.nio.file.Files.createTempDirectory("joinstream").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    def land(rs: Seq[(Long, Long, String, Timestamp, Double)],
             name: String): Unit = {
      val stage = s"$root/stage_$name"
      rs.toDF("event_id", "user_id", "event_type", "tstamp", "value")
        .coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }
    def run(): Unit =
      JoinStream.start(spark, src, schema, "view", "purchase",
        maxGap = "1 HOUR", watermark = "30 DAYS", out, ckpt)
        .awaitTermination()

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      df.select($"user_id", $"l_id", $"r_id", $"gap_us")
        .as[(Long, Long, Long, Long)].collect().toSet

    land(batch1, "b1"); run()
    land(batch2, "b2"); run()

    val streamed = pairs(spark.read.parquet(out))
    val reference = pairs(JoinStream.batchReference(
      (batch1 ++ batch2)
        .toDF("event_id", "user_id", "event_type", "tstamp", "value"),
      "view", "purchase", "1 HOUR"))
    assert(streamed === reference)
    // the shape we planted: u1 has TWO in-gap pairs, u4's pair crosses
    // the batch boundary, u2's out-of-gap and u3's view-less purchase
    // never emit
    assert(streamed === Set(
      (1L, 1L, 2L, 30L * 60000000L),
      (1L, 1L, 6L, 50L * 60000000L),
      (4L, 5L, 7L, 40L * 60000000L)))

    // rerun with no new data: exactly-once sink appends nothing
    run()
    assert(pairs(spark.read.parquet(out)) === streamed)
  }

  test("watermark + gap bound evicts state: a too-late right row cannot join") {
    val root = java.nio.file.Files.createTempDirectory("joinlate").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()
    def land(rs: Seq[(Long, Long, String, Timestamp, Double)],
             name: String): Unit = {
      val stage = s"$root/stage_$name"
      rs.toDF("event_id", "user_id", "event_type", "tstamp", "value")
        .coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }
    def run(): Unit =
      JoinStream.start(spark, src, schema, "view", "purchase",
        maxGap = "1 HOUR", watermark = "10 MINUTES", out, ckpt)
        .awaitTermination()

    // run 1: a view at t0 plus far-future rows on BOTH sides (disjoint
    // users, so they never pair) — the global watermark is the MIN of
    // the two sides' watermarks, so the right (purchase) side must see
    // data too or it pins the global watermark at 0
    land(Seq(
      (1L, 1L, "view", at(0), 1.0),
      (2L, 8L, "view", at(600), 1.0),
      (3L, 9L, "purchase", at(600), 1.0)), "b1")
    run()
    // run 2: processed UNDER watermark 590 (watermarks apply one batch
    // later) — the view-at-0 state row (matchable only to r_ts ≤ 60min)
    // is provably evicted at its commit
    land(Seq(
      (4L, 8L, "view", at(601), 1.0),
      (5L, 9L, "purchase", at(601), 1.0)), "b2")
    run()
    // run 3: a purchase inside the ORIGINAL gap but far behind the
    // watermark — its match was evicted; emitting nothing is the
    // documented bounded-state trade
    land(Seq((4L, 1L, "purchase", at(30), 10.0)), "b3")
    run()
    val got = spark.read.parquet(out)
    assert(got.count() === 0L)
  }
}
