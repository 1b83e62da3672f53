package graft.ops

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.PartitionedStore

class MultimodalStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("multimodal: batched decode produces deterministic fixed-width features") {
    val media = Seq(
      Multimodal.Media(1L, Array[Byte](1, 2, 3, 4), "jpeg"),
      Multimodal.Media(2L, Array[Byte](9, 8, 7), "png")
    ).toDS()
    val out1 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.id)
    val out2 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.id)
    assert(out1.forall(_.features.length == 8))
    assert(out1.map(_.features.toSeq) === out2.map(_.features.toSeq))
    assert(out1.map(_.id).toSeq === Seq(1L, 2L))
    assert(out1.forall(f => f.width >= 16 && f.height >= 16))
  }

  test("multimodal: declarative hash features stay in DataFrame land") {
    val df = Seq((1L, Array[Byte](1, 2)), (2L, Array[Byte](3)))
      .toDF("id", "payload")
    val out = Multimodal.hashFeatures(df, "payload", dim = 4)
    assert(out.select(size($"features")).as[Int].collect().forall(_ == 4))
    val a = out.orderBy("id").select("features").as[Seq[Float]].collect()
    val b = Multimodal.hashFeatures(df, "payload", dim = 4)
      .orderBy("id").select("features").as[Seq[Float]].collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("partitioned store: monthly layout + partition pruning on read") {
    val dir = Files.createTempDirectory("graft_store").toString + "/t"
    val df = Seq(
      ("BTC", "2024-01-05 00:00:00", 1.0), ("BTC", "2024-02-05 00:00:00", 2.0),
      ("ETH", "2024-01-15 00:00:00", 3.0)
    ).toDF("symbol", "ts_s", "v")
      .withColumn("tstamp", to_timestamp($"ts_s")).drop("ts_s")
    PartitionedStore.write(df, "tstamp", Seq("symbol", "tstamp"), dir)

    val back = PartitionedStore.read(spark, dir)
    assert(back.count() === 3)
    val jan = back.filter($"ym" === "202401")
    assert(jan.count() === 2)
    // pruning is visible in the plan: only one partition dir survives
    val planStr = jan.queryExecution.executedPlan.toString
    assert(new java.io.File(dir).listFiles().map(_.getName).count(_.startsWith("ym=")) === 2)
    assert(!planStr.toLowerCase.contains("ym=202402"))
  }
}
