package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Streaming contribution counter: keep-last streamed counts must equal a
  * plain groupBy-count for every batch split and across checkpointed
  * restarts, and the cap CURVE built from them must equal the q325-style
  * aggregation computed from scratch — streamed ≡ batch end-to-end.
  */
class CapStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Caps = Seq(1L, 2L, 4L, 8L, 16L, 32L)

  /** Independent oracle: plain Scala counting + curve arithmetic. */
  private def referenceCurve(rows: Seq[CapStream.Ev])
      : Seq[(Long, Long, Long, Long, Long)] = {
    val cnts = rows.groupBy(_.userId).map { case (_, v) => v.size.toLong }
    val total = cnts.sum
    Caps.map { cap =>
      val kept = cnts.map(c => math.min(c, cap)).sum
      (cap, cnts.size.toLong, cnts.count(_ > cap).toLong, kept,
        kept * 1000000L / total)
    }
  }

  private def driveBatches(rows: Seq[CapStream.Ev], nBatches: Int)
      : Map[Long, Long] = {
    val root = Files.createTempDirectory(s"cap_$nBatches").toString
    val src = s"$root/src"; new java.io.File(src).mkdirs()
    val last = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    def runOnce(): Unit = {
      val evs = spark.readStream
        .schema(Seq(CapStream.Ev(0L, 0L)).toDS().schema)
        .parquet(src)
        .as[CapStream.Ev]
      val q = CapStream.updates(evs).writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[CapStream.CntUpdate], _: Long) =>
            b.collect().foreach(u => last.put(u.userId, u.cnt))
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    rows.grouped(math.ceil(rows.size.toDouble / nBatches).toInt)
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

  private def fixture(seed: Int, n: Int): Seq[CapStream.Ev] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => CapStream.Ev(rnd.nextInt(17).toLong, i.toLong))
  }

  test("streamed counts equal groupBy-count at 1, 3 and 7 batch splits") {
    val rows = fixture(7, 150)
    val expect = rows.groupBy(_.userId).map { case (k, v) =>
      k -> v.size.toLong }
    Seq(1, 3, 7).foreach { nb =>
      assert(driveBatches(rows, nb) === expect, s"split=$nb")
    }
  }

  test("cap curve from streamed counts equals the from-scratch q325 aggregation") {
    val rows = fixture(11, 220)
    val streamed = driveBatches(rows, 4).toSeq.toDF("userId", "cnt")
    val got = CapStream.curve(streamed, Caps)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === referenceCurve(rows))
  }

  test("late users join the state without disturbing earlier counts") {
    // batch 1: users 0-4 only; batch 2 introduces users 5-9 and more
    // activity on 0-4 — counts must accumulate, not reset
    val b1 = (1 to 50).map(i => CapStream.Ev((i % 5).toLong, i.toLong))
    val b2 = (51 to 120).map(i => CapStream.Ev((i % 10).toLong, i.toLong))
    val all = b1 ++ b2
    val expect = all.groupBy(_.userId).map { case (k, v) =>
      k -> v.size.toLong }
    assert(driveBatches(all, 2) === expect)
  }
}
