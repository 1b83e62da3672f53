package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.TestSpark

/** Incremental Misra–Gries heavy-hitters store: exact when distinct ≤ k;
  * for ANY batching, every stored count is within n/(k+1) below truth and
  * every item with true frequency > n/(k+1) is present; replay is a
  * no-op; untouched keys never rewritten.
  */
class MgStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("item", StringType, nullable = false)))

  private def land(root: String, rs: Seq[(String, String)],
                   name: String): Unit = {
    val stage = s"$root/stage_$name"
    rs.toDF("key", "item").coalesce(1).write.parquet(stage)
    new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$root/src/${name}.parquet")))
  }

  private def counters(store: String): Map[(String, String), Long] =
    MgStream.counters(spark, store, Seq("key"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("distinct items <= k: streamed counts are EXACT for any batching") {
    val root = java.nio.file.Files.createTempDirectory("mg1").toString
    new java.io.File(s"$root/src").mkdirs()
    val b1 = Seq.fill(5)(("a", "x")) ++ Seq.fill(2)(("a", "y"))
    val b2 = Seq.fill(3)(("a", "x")) ++ Seq.fill(4)(("a", "z")) ++
      Seq.fill(1)(("a", "y"))
    land(root, b1, "b1")
    MgStream.start(spark, s"$root/src", schema, Seq("key"), "item",
      k = 5, s"$root/store", s"$root/ckpt").awaitTermination()
    land(root, b2, "b2")
    MgStream.start(spark, s"$root/src", schema, Seq("key"), "item",
      k = 5, s"$root/store", s"$root/ckpt").awaitTermination()
    assert(counters(s"$root/store") ===
      Map(("a", "x") -> 8L, ("a", "y") -> 3L, ("a", "z") -> 4L))
  }

  test("MG guarantee holds across DIFFERENT batchings: presence above " +
    "n/(k+1), undercount within n/(k+1), per key") {
    val rnd = new scala.util.Random(7)
    val k = 8
    // two keys; per key a skewed stream: heavies h0..h2 plus a long tail
    val rows = (1 to 2000).map { _ =>
      val key = s"k${rnd.nextInt(2)}"
      val item =
        if (rnd.nextInt(10) < 6) s"h${rnd.nextInt(3)}"
        else s"t${rnd.nextInt(200)}"
      (key, item)
    }
    val truth = rows.groupBy(identity).map { case (r, a) => r -> a.size.toLong }
    val nPerKey = rows.groupBy(_._1).map { case (g, a) => g -> a.size.toLong }

    Seq(2, 5).foreach { nBatches =>
      val root = java.nio.file.Files
        .createTempDirectory(s"mg_$nBatches").toString
      new java.io.File(s"$root/src").mkdirs()
      rows.grouped(math.ceil(rows.size.toDouble / nBatches).toInt)
        .zipWithIndex.foreach { case (b, i) =>
          land(root, b, f"b$i%02d")
          MgStream.start(spark, s"$root/src", schema, Seq("key"), "item",
            k, s"$root/store", s"$root/ckpt").awaitTermination()
        }
      val got = counters(s"$root/store")
      nPerKey.foreach { case (key, n) =>
        val eps = n / (k + 1)
        // stored counts never exceed truth and undercount by <= eps
        got.filter(_._1._1 == key).foreach { case ((_, item), cnt) =>
          val t = truth((key, item))
          assert(cnt <= t && t - cnt <= eps,
            s"$nBatches batches: ($key,$item) stored $cnt truth $t eps $eps")
        }
        // every true heavy hitter is present
        truth.filter { case ((g, _), c) => g == key && c > eps }.foreach {
          case ((_, item), c) =>
            assert(got.contains((key, item)),
              s"$nBatches batches: heavy ($key,$item) freq $c missing")
        }
        // bounded state
        assert(got.count(_._1._1 == key) <= k)
      }
    }
  }

  test("replay of the same batch is a no-op; untouched keys not rewritten") {
    val root = java.nio.file.Files.createTempDirectory("mg3").toString
    new java.io.File(s"$root/src").mkdirs()
    val b1 = Seq.fill(4)(("a", "x")) ++ Seq.fill(3)(("b", "p"))
    val b2 = Seq.fill(2)(("a", "y"))  // touches only key a
    land(root, b1, "b1")
    MgStream.start(spark, s"$root/src", schema, Seq("key"), "item",
      k = 4, s"$root/store", s"$root/ckpt").awaitTermination()
    land(root, b2, "b2")
    MgStream.start(spark, s"$root/src", schema, Seq("key"), "item",
      k = 4, s"$root/store", s"$root/ckpt").awaitTermination()
    val before = counters(s"$root/store")
    // at-least-once replay: reprocess batch 1 against the same store
    MgStream.processBatch(spark, b2.toDF("key", "item"), 1L,
      Seq("key"), "item", 4, s"$root/store")
    assert(counters(s"$root/store") === before)
    // key b was written exactly once (version 0 only)
    val bVersions = spark.read.parquet(s"$root/store")
      .where($"key" === "b").select($"__v").as[Long].collect().toSeq
    assert(bVersions === Seq(0L))
  }
}
