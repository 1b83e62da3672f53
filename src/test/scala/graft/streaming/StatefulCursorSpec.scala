package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Per-key cursor state must advance across batches and survive via the
  * checkpoint (the streaming analog of progress.json resume).
  */
class StatefulCursorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("flatMapGroupsWithState cursor advances across two checkpointed batches") {
    val root = Files.createTempDirectory("graft_cursor").toString
    val src = s"$root/src"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    def land(rows: Seq[StatefulCursor.Tick], name: String): Unit = {
      val stage = s"$root/stage_$name"
      rows.toDF().coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }

    val collected = new java.util.concurrent.ConcurrentLinkedQueue[StatefulCursor.CursorUpdate]()
    def runOnce(): Map[String, (Long, Long)] = {
      val ticks = spark.readStream
        .schema(Seq(StatefulCursor.Tick("x", 0L)).toDS().schema)
        .parquet(src)
        .as[StatefulCursor.Tick]
      // memory sink can't recover from a checkpoint; foreachBatch can
      val q = StatefulCursor.updates(ticks).writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StatefulCursor.CursorUpdate], _: Long) =>
          batch.collect().foreach(collected.add)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      collected.asScala.toSeq
        .groupBy(_.key)
        .map { case (k, us) =>
          val last = us.maxBy(u => (u.totalRows, u.watermarkUs))
          k -> (last.watermarkUs, last.totalRows)
        }.toMap
    }

    land(Seq(StatefulCursor.Tick("BTC", 100L), StatefulCursor.Tick("BTC", 300L),
      StatefulCursor.Tick("ETH", 50L)), "b1")
    val after1 = runOnce()
    assert(after1("BTC") === ((300L, 2L)))
    assert(after1("ETH") === ((50L, 1L)))

    // batch 2: older + newer rows — cursor must only move forward
    land(Seq(StatefulCursor.Tick("BTC", 200L), StatefulCursor.Tick("BTC", 900L),
      StatefulCursor.Tick("ETH", 40L)), "b2")
    val after2 = runOnce()
    assert(after2("BTC") === ((900L, 4L)))   // state carried: 2+2 rows, max 900
    assert(after2("ETH") === ((50L, 2L)))    // older row doesn't regress cursor
  }
}
