package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Streaming stride debounce: the 3-long state fold must equal the
  * sequential last-kept recurrence for every order-respecting batching,
  * survive a checkpointed restart, and keep counts monotone.
  */
class DebounceStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = 500L // stride µs, small for readable fixtures

  /** The sequential recurrence (also what q316's HOF fold replays). */
  private def reference(rows: Seq[DebounceStream.Ev], stride: Long = S)
      : Map[(Long, String), (Long, Long)] =
    rows.groupBy(e => (e.userId, e.eventType)).map { case (k, evs) =>
      var lastKept = Long.MinValue; var kept = 0L
      evs.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
        if (lastKept == Long.MinValue || e.tsUs - lastKept >= stride) {
          lastKept = e.tsUs; kept += 1
        }
      }
      k -> (kept, evs.size.toLong)
    }

  private def driveBatches(rows: Seq[DebounceStream.Ev], nBatches: Int,
      stride: Long = S): Map[(Long, String), (Long, Long)] = {
    val root = Files.createTempDirectory(s"debounce_$nBatches").toString
    val src = s"$root/src"; new java.io.File(src).mkdirs()
    val last = new java.util.concurrent.ConcurrentHashMap[
      (Long, String), (Long, Long)]()
    def runOnce(): Unit = {
      val evs = spark.readStream
        .schema(Seq(DebounceStream.Ev(0L, "x", 0L, 0L)).toDS().schema)
        .parquet(src)
        .as[DebounceStream.Ev]
      val q = DebounceStream.updates(evs, stride).writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[DebounceStream.KeptUpdate],
           _: Long) => b.collect().foreach(u =>
            last.put((u.userId, u.eventType), (u.kept, u.total)))
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val ordered = rows.sortBy(e => (e.tsUs, e.eventId))
    ordered.grouped(math.ceil(ordered.size.toDouble / nBatches).toInt)
      .zipWithIndex.foreach { case (b, i) =>
        val stage = s"$root/stage_$i"
        b.toDS().coalesce(1).write.parquet(stage)
        new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .foreach(f => Files.move(f.toPath,
            java.nio.file.Paths.get(s"$src/b$i.parquet")))
        runOnce() // same checkpoint every landing: restarts included
      }
    import scala.jdk.CollectionConverters._
    last.asScala.toMap
  }

  private def fixture(seed: Int, n: Int): Seq[DebounceStream.Ev] = {
    val rnd = new scala.util.Random(seed)
    val types = Seq("view", "click")
    (1 to n).map { i =>
      DebounceStream.Ev(rnd.nextInt(6).toLong,
        types(rnd.nextInt(types.size)),
        rnd.nextInt(4000).toLong, i.toLong)
    }
  }

  test("streamed kept/total == sequential recurrence at 1, 3, 7 batches") {
    val rows = fixture(43, 400)
    val want = reference(rows)
    Seq(1, 3, 7).foreach { nb =>
      assert(driveBatches(rows, nb) === want, s"$nb batches")
    }
  }

  test("equal-timestamp ties are order-free: any tie order, same kept set") {
    val base = Seq(
      DebounceStream.Ev(1L, "view", 100L, 1L),
      DebounceStream.Ev(1L, "view", 100L, 2L),
      DebounceStream.Ev(1L, "view", 700L, 3L),
      DebounceStream.Ev(1L, "view", 700L, 4L))
    val flipped = base.map(e => e.copy(eventId = 5L - e.eventId))
    assert(reference(base).values.toSeq === reference(flipped).values.toSeq)
    assert(driveBatches(base, 2) === reference(base))
  }

  test("empty stride window keeps everything; huge stride keeps one per key") {
    val rows = fixture(44, 60)
    val totals = rows.groupBy(e => (e.userId, e.eventType))
      .map { case (k, v) => k -> v.size.toLong }
    val huge = Long.MaxValue / 2
    // stride 0: every event kept — reference AND the streamed fold
    val zeroRef = reference(rows, 0L)
    assert(zeroRef.forall { case (k, (kept, total)) =>
      kept == total && total == totals(k) })
    assert(driveBatches(rows, 3, 0L) === zeroRef)
    // huge stride: exactly one survivor per key — both engines again
    val hugeRef = reference(rows, huge)
    assert(hugeRef.forall { case (k, (kept, total)) =>
      kept == 1L && total == totals(k) })
    assert(driveBatches(rows, 3, huge) === hugeRef)
  }
}
