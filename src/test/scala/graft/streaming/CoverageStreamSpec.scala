package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Streaming interval-union coverage: the 4-long state fold must equal an
  * INDEPENDENT merge-intervals oracle for every start-ordered batching,
  * survive a checkpointed restart, and keep covered ≤ span.
  */
class CoverageStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent oracle: sort, merge overlapping segments, sum lengths —
    * NOT the stream's recurrence (a shared bug could not hide).
    */
  private def reference(rows: Seq[CoverageStream.Iv])
      : Map[String, (Long, Long, Long)] =
    rows.filter(i => i.endUs > i.startUs).groupBy(_.key).map {
      case (k, ivs) =>
        val sorted = ivs.map(i => (i.startUs, i.endUs)).sortBy(identity)
        var covered = 0L
        var (cs, ce) = sorted.head
        sorted.tail.foreach { case (s, e) =>
          if (s > ce) { covered += ce - cs; cs = s; ce = e }
          else ce = math.max(ce, e)
        }
        covered += ce - cs
        val span = sorted.map(_._2).max - sorted.map(_._1).min
        k -> (ivs.size.toLong, covered, span)
    }

  private def driveBatches(rows: Seq[CoverageStream.Iv],
                           nBatches: Int): Map[String, (Long, Long, Long)] = {
    val root = Files.createTempDirectory(s"cov_$nBatches").toString
    val src = s"$root/src"; new java.io.File(src).mkdirs()
    val last =
      new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Long)]()
    def runOnce(): Unit = {
      val ivs = spark.readStream
        .schema(Seq(CoverageStream.Iv("x", 0L, 0L, 0L)).toDS().schema)
        .parquet(src)
        .as[CoverageStream.Iv]
      val q = CoverageStream.updates(ivs).writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[CoverageStream.CovUpdate],
           _: Long) => b.collect().foreach(u =>
            last.put(u.key, (u.nIntervals, u.coveredUs, u.spanUs)))
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // start-ordered split per the append-only contract
    val ordered = rows.sortBy(i => (i.startUs, i.endUs, i.eventId))
    ordered.grouped(math.ceil(ordered.size.toDouble / nBatches).toInt)
      .zipWithIndex.foreach { case (b, i) =>
        val stage = s"$root/stage_$i"
        b.toDS().coalesce(1).write.parquet(stage)
        new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .foreach(f => Files.move(f.toPath,
            java.nio.file.Paths.get(s"$src/b$i.parquet")))
        runOnce() // each landing reuses the checkpoint: a restart per batch
      }
    import scala.jdk.CollectionConverters._
    last.asScala.toMap
  }

  private def fixture(seed: Int, n: Int): Seq[CoverageStream.Iv] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val s = rnd.nextInt(10000).toLong
      CoverageStream.Iv(s"k${rnd.nextInt(5)}", s,
        s + rnd.nextInt(300).toLong, i.toLong)  // some zero-length
    }
  }

  test("streamed union == merge-intervals oracle for 1, 3, and 7 batches") {
    val rows = fixture(61, 400)
    val want = reference(rows)
    Seq(1, 3, 7).foreach { nb =>
      assert(driveBatches(rows, nb) === want, s"$nb batches")
    }
  }

  test("covered never exceeds span; both monotone across batches") {
    val rows = fixture(67, 300)
    val got = driveBatches(rows, 5)
    got.foreach { case (k, (_, covered, span)) =>
      assert(covered <= span, s"key $k: covered $covered > span $span")
      assert(covered > 0L)
    }
  }

  test("gap case: touching intervals merge, gapped ones do not") {
    val rows = Seq(
      CoverageStream.Iv("a", 0, 100, 1),
      CoverageStream.Iv("a", 100, 200, 2),  // touches: [0,200) = 200
      CoverageStream.Iv("a", 300, 400, 3),  // gap of 100
      CoverageStream.Iv("b", 0, 50, 4),
      CoverageStream.Iv("b", 10, 20, 5))    // nested: still 50
    val got = driveBatches(rows, 2)
    assert(got("a") === ((3L, 300L, 400L)))
    assert(got("b") === ((2L, 50L, 50L)))
  }
}
