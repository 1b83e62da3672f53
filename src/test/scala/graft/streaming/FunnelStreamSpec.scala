package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Streaming windowFunnel: the 3-long state fold must equal the batch
  * q205 recurrence for every order-respecting batching, survive a
  * checkpointed restart, and never lower a level.
  */
class FunnelStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 1000L // window µs, small for readable fixtures

  /** Batch q205 recurrence, folded sequentially (the oracle the query's
    * window maxima replay).
    */
  private def reference(rows: Seq[FunnelStream.Ev]): Map[Long, Long] =
    rows.groupBy(_.userId).map { case (u, evs) =>
      var maxV = Long.MinValue; var maxA = Long.MinValue; var lvl = 0L
      evs.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
        e.eventType match {
          case "view" => maxV = math.max(maxV, e.tsUs); lvl = lvl.max(1)
          case "click" =>
            if (maxV != Long.MinValue && e.tsUs <= maxV + W) {
              maxA = math.max(maxA, maxV); lvl = lvl.max(2)
            }
          case "purchase" =>
            if (maxA != Long.MinValue && e.tsUs <= maxA + W) lvl = 3
          case _ => ()
        }
      }
      u -> lvl
    }

  private def driveBatches(rows: Seq[FunnelStream.Ev],
                           nBatches: Int): Map[Long, Long] = {
    val root = Files.createTempDirectory(s"funnel_$nBatches").toString
    val src = s"$root/src"; new java.io.File(src).mkdirs()
    val last = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    def runOnce(): Unit = {
      val evs = spark.readStream
        .schema(Seq(FunnelStream.Ev(0L, 0L, 0L, "x")).toDS().schema)
        .parquet(src)
        .as[FunnelStream.Ev]
      val q = FunnelStream.updates(evs, W).writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[FunnelStream.LevelUpdate],
           _: Long) => b.collect().foreach(u => last.put(u.userId, u.level))
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // order-respecting split: contiguous (ts, event_id) runs per batch
    val ordered = rows.sortBy(e => (e.tsUs, e.eventId))
    ordered.grouped(math.ceil(ordered.size.toDouble / nBatches).toInt)
      .zipWithIndex.foreach { case (b, i) =>
        val stage = s"$root/stage_$i"
        b.toDS().coalesce(1).write.parquet(stage)
        new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .foreach(f => Files.move(f.toPath,
            java.nio.file.Paths.get(s"$src/b$i.parquet")))
        runOnce() // each landing runs on the SAME checkpoint: a restart
      }
    import scala.jdk.CollectionConverters._
    last.asScala.toMap
  }

  private def fixture(seed: Int, n: Int): Seq[FunnelStream.Ev] = {
    val rnd = new scala.util.Random(seed)
    val types = Seq("view", "click", "purchase", "error")
    (1 to n).map { i =>
      FunnelStream.Ev(rnd.nextInt(8).toLong, rnd.nextInt(5000).toLong,
        i.toLong, types(rnd.nextInt(types.size)))
    }
  }

  test("streamed levels == batch recurrence for 1, 3, and 7 batches") {
    val rows = fixture(41, 400)
    val want = reference(rows)
    Seq(1, 3, 7).foreach { nb =>
      assert(driveBatches(rows, nb) === want, s"$nb batches")
    }
  }

  test("levels are monotone across batches (state never regresses)") {
    val rows = fixture(43, 300)
    val ordered = rows.sortBy(e => (e.tsUs, e.eventId))
    val halves = ordered.grouped(150).toSeq
    val after1 = reference(halves.head)
    val after2 = reference(ordered)
    after1.foreach { case (u, l1) =>
      assert(after2.getOrElse(u, 0L) >= l1, s"user $u regressed")
    }
    // and the streamed fold agrees at both points
    assert(driveBatches(ordered, 2) === after2)
  }

  test("chain must fit the window: distant purchase stays level 2") {
    val rows = Seq(
      FunnelStream.Ev(1, 0, 1, "view"),
      FunnelStream.Ev(1, 10, 2, "click"),      // anchored at v=0
      FunnelStream.Ev(1, 2000, 3, "purchase"), // 2000 > 0 + W: no level 3
      FunnelStream.Ev(2, 0, 4, "view"),
      FunnelStream.Ev(2, 10, 5, "click"),
      FunnelStream.Ev(2, 900, 6, "purchase"))  // inside the window
    val got = driveBatches(rows, 2)
    assert(got(1L) === 2L)
    assert(got(2L) === 3L)
  }
}
