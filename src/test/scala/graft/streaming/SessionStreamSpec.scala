package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}
import graft.TestSpark

/** Streaming session windows: closed sessions streamed over many batches
  * ≡ one-shot batch aggregate; late rows inside the horizon merge into
  * their open session; replay with no new data emits nothing.
  */
class SessionStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("user", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private def rows(rs: Seq[(String, Long, Double)]) =
    rs.toDF("user", "s", "value")
      .select($"user", timestamp_seconds($"s").as("ts"), $"value")

  // gap 60s. A: two sessions (10..70 chain, then 300); B: one session.
  // (A, 65) lands LATE in batch 2 but within the 90s horizon — it must
  // merge into A's first session, not fragment it.
  private val batch1 = Seq(
    ("A", 10L, 1.0), ("A", 40L, 2.0), ("B", 20L, 5.0))
  private val batch2 = Seq(
    ("A", 65L, 3.0), ("B", 30L, 6.0), ("A", 300L, 4.0))
  // sentinel far in the future flushes the watermark past every real
  // session's close
  private val flush = Seq(("ZZ", 100000L, 0.0))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.filter($"user" =!= "ZZ")
      .select($"user", unix_timestamp($"session_start").as("b"),
        unix_timestamp($"session_end").as("e"), $"n_events", $"sum_value")
      .as[(String, Long, Long, Long, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2))

  test("multi-batch streamed sessions == batch aggregate; late row merges; replay no-op") {
    val root = java.nio.file.Files.createTempDirectory("sessstream").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    def land(rs: Seq[(String, Long, Double)], name: String): Unit = {
      val stage = s"$root/stage_$name"
      rows(rs).coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }
    def run(): Unit = {
      val q = SessionStream.start(spark, src, schema, "user", "ts",
        "value", "60 seconds", "90 seconds", out, ckpt)
      q.awaitTermination()
    }

    land(batch1, "b1"); run()
    land(batch2, "b2"); run()
    land(flush, "b3"); run()

    val streamed = canon(spark.read.parquet(out))
    val ref = canon(SessionStream.sessionAgg(
      rows(batch1 ++ batch2 ++ flush), "user", "ts", "value",
      "60 seconds", "90 seconds"))
    assert(streamed === ref)
    // the late (A, 65) merged: A's first session is one window 10..125
    // (65 + 60s gap) with 3 events
    assert(streamed.count { case (u, _, _, _, _) => u == "A" } === 2)
    assert(streamed.filter(_._1 == "A").head ===
      (("A", 10L, 125L, 3L, 6.0)))

    // replay with no new files: nothing new emitted
    run()
    assert(canon(spark.read.parquet(out)) === streamed)
  }
}
