package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Streaming tumbling-window aggregation with watermark (SURVEY.md §2.10):
  * the streaming form of the OHLCV resample must agree with the batch
  * computation once all data is processed (AvailableNow catch-up).
  */
class WatermarkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed windowed agg with watermark == batch resample") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = graft.Tables.events(spark, dir)
      .groupBy($"event_type", window($"tstamp", "1 hour"))
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("v"))
      .select($"event_type", unix_micros($"window.start").as("b"), $"n", $"v")

    val stream = spark.readStream
      .schema(graft.Tables.eventsNativeSchema(spark, dir))
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(dir)
      .transform(graft.Tables.withTstamp)
      .withWatermark("tstamp", "10 minutes")
      .groupBy($"event_type", window($"tstamp", "1 hour"))
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("v"))
      .select($"event_type", unix_micros($"window.start").as("b"), $"n", $"v")

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("wm_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("wm_out")
      .as[(String, Long, Long, Double)].collect().toSeq.sorted
    val want = batch.as[(String, Long, Long, Double)].collect().toSeq.sorted
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming dedup-within-watermark collapses a re-delivered file (T4)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dup")
    val srcFile = java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet")
    // the same page delivered twice — the reference's overlapping-refetch
    // reality, here as two identical files in the stream source
    java.nio.file.Files.copy(srcFile, dir.resolve("a.parquet"))
    java.nio.file.Files.copy(srcFile, dir.resolve("b.parquet"))

    val distinctIds = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id").distinct().count()

    val stream = spark.readStream
      .schema(graft.Tables.eventsNativeSchema(spark, "/root/testdata/sf0.001"))
      .parquet(dir.toString)
      .transform(graft.Tables.withTstamp)
      .withWatermark("tstamp", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

    val q = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    assert(spark.table("dedup_out").count() === distinctIds)
    assert(spark.table("dedup_out").select("event_id").distinct().count() === distinctIds)
  }
}
