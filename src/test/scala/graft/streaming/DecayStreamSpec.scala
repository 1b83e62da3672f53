package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import graft.TestSpark

/** Incremental decay-score store (q198's streaming form): the bounded
  * daily ledger makes the resolved state bit-identical under ANY
  * batching (sums/maxima are associative), the derived score equals the
  * from-scratch q198 arithmetic over the concatenated stream, pruning
  * beyond the decay horizon never changes a score, and replay is a
  * no-op with untouched keys never rewritten.
  */
class DecayStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),     // epoch NANOS
    StructField("value", DoubleType, nullable = false)))

  private val dayNs = 86400000000000L

  private def land(root: String, rs: Seq[(Long, Long, Double)],
                   name: String): Unit = {
    val stage = s"$root/stage_$name"
    rs.toDF("user_id", "ts", "value").coalesce(1).write.parquet(stage)
    new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$root/src/${name}.parquet")))
  }

  private def run(root: String): Unit =
    DecayStream.start(spark, s"$root/src", schema, "user_id",
      s"$root/store", s"$root/ckpt").awaitTermination()

  private def got(root: String): Map[Long, Long] =
    DecayStream.scores(spark, s"$root/store", "user_id")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap

  /** q198's arithmetic from scratch over all rows. */
  private def reference(rs: Seq[(Long, Long, Double)]): Map[Long, Long] = {
    val daily = rs.groupBy(r => (r._1, r._2 / 1000 / 86400000000L))
      .map { case ((u, d), a) =>
        (u, d, a.map(r => math.floor(r._3 * 100).toLong).sum) }
    val mx = daily.map(_._2).max
    daily.groupBy(_._1).map { case (u, a) =>
      u -> a.map { case (_, d, cents) =>
        val age = mx - d
        if (age > DecayStream.horizon) 0L
        else cents * DecayStream.decayPpm(age.toInt)
      }.sum
    }
  }

  test("streamed score == from-scratch q198 arithmetic, for any batching") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { _ =>
      (rnd.nextInt(6).toLong,
        rnd.nextInt(40).toLong * dayNs + rnd.nextInt(1000).toLong * 1000000L,
        rnd.nextDouble() * 20 - 5)
    }
    val want = reference(rows)
    Seq(1, 3).foreach { nBatches =>
      val root = java.nio.file.Files
        .createTempDirectory(s"decay_$nBatches").toString
      new java.io.File(s"$root/src").mkdirs()
      rows.grouped(math.ceil(rows.size.toDouble / nBatches).toInt)
        .zipWithIndex.foreach { case (b, i) =>
          land(root, b, f"b$i%02d"); run(root)
        }
      assert(got(root) === want, s"$nBatches batches")
    }
  }

  test("resolved ledgers are bit-identical across different batchings") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 200).map { _ =>
      (rnd.nextInt(4).toLong, rnd.nextInt(35).toLong * dayNs,
        rnd.nextDouble() * 10)
    }
    def ledger(root: String): Set[(Long, Long, Long)] = {
      graft.ops.Dedup.keepLast(
          spark.read.parquet(s"$root/store"), Seq("__k"), Seq("__v"))
        .select($"__k", org.apache.spark.sql.functions
          .explode($"__ledger").as(Seq("__day", "__cents")))
        .as[(Long, Long, Long)].collect().toSet
    }
    val roots = Seq(2, 5).map { nBatches =>
      val root = java.nio.file.Files
        .createTempDirectory(s"decayl_$nBatches").toString
      new java.io.File(s"$root/src").mkdirs()
      rows.grouped(math.ceil(rows.size.toDouble / nBatches).toInt)
        .zipWithIndex.foreach { case (b, i) =>
          land(root, b, f"b$i%02d"); run(root)
        }
      root
    }
    assert(ledger(roots(0)) === ledger(roots(1)))
  }

  test("pruning beyond the horizon bounds state and never changes a score") {
    val root = java.nio.file.Files.createTempDirectory("decay_p").toString
    new java.io.File(s"$root/src").mkdirs()
    // user 1: activity on day 0, then much later on day 100
    land(root, Seq((1L, 0L * dayNs, 50.0)), "b1"); run(root)
    land(root, Seq((1L, 100L * dayNs, 30.0)), "b2"); run(root)
    val led = graft.ops.Dedup.keepLast(
        spark.read.parquet(s"$root/store"), Seq("__k"), Seq("__v"))
      .select(org.apache.spark.sql.functions.explode($"__ledger"))
      .collect()
    assert(led.length === 1, "day-0 entry should be pruned")
    // score = only the day-100 activity at age 0
    assert(got(root) === Map(1L -> 3000L * 1000000L))
  }

  test("replay is a no-op; untouched keys never rewritten") {
    val root = java.nio.file.Files.createTempDirectory("decay_r").toString
    new java.io.File(s"$root/src").mkdirs()
    land(root, Seq((1L, 5L * dayNs, 10.0), (2L, 5L * dayNs, 7.0)), "b1")
    run(root)
    val b2 = Seq((1L, 6L * dayNs, 4.0))                // touches only key 1
    land(root, b2, "b2"); run(root)
    val before = got(root)
    DecayStream.processBatch(spark,
      b2.toDF("user_id", "ts", "value"), 1L, "user_id", s"$root/store")
    assert(got(root) === before)
    val k2Versions = spark.read.parquet(s"$root/store")
      .where($"__k" === 2L).select($"__v").as[Long].collect().toSeq
    assert(k2Versions === Seq(0L))
  }
}
