package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Small-files compaction: file counts drop to the byte-target, data
  * survives bit-identical, and per-file key ranges come out disjoint
  * (footer-pruning quality), month by month.
  */
class StoreCompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val df = (1 to 2000).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-${1 + i % 2}%02d-0${1 + i % 9} 00:00:00"), i * 1.5)
    }.toDF("k", "ts", "v")
    // bucket=16 on tiny data = the many-small-files shape ingest leaves
    PartitionedStore.write(df, "ts", Seq("k"), dir, buckets = 16)
    (dir, df)
  }

  private def filesPerYm(dir: String): Map[String, Int] =
    new java.io.File(dir).listFiles().filter(_.getName.startsWith("ym="))
      .map(d => d.getName.stripPrefix("ym=") ->
        d.listFiles().count(_.getName.endsWith(".parquet"))).toMap

  test("compaction hits the file target and preserves the data exactly") {
    val (dir, df) = freshStore()
    val before = filesPerYm(dir)
    assert(before.values.forall(_ > 1), s"fixture not fragmented: $before")

    val report = PartitionedStore.compact(spark, dir, Seq("k"),
      targetBytes = 512L * 1024 * 1024) // everything fits one file
    assert(report.keySet === before.keySet)
    val after = filesPerYm(dir)
    assert(after.values.forall(_ === 1), s"expected 1 file per month: $after")

    val got = spark.read.parquet(dir).select("k", "ts", "v")
    assert(got.exceptAll(df).isEmpty && df.exceptAll(got).isEmpty)
  }

  test("compacted files have disjoint sort-key ranges within each month") {
    val (dir, _) = freshStore()
    PartitionedStore.compact(spark, dir, Seq("k"), targetBytes = 8L * 1024)
    val ranges = spark.read.parquet(dir)
      .groupBy(col("ym"), input_file_name().as("f"))
      .agg(min($"k").as("lo"), max($"k").as("hi"))
      .collect()
      .groupBy(_.get(0).toString)
    ranges.foreach { case (ym, rows) =>
      val sorted = rows.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) =>
          assert(hi1 <= lo2, s"$ym: overlapping file ranges $sorted")
        case _ => ()
      }
    }
  }

  test("already-compact months are left untouched") {
    val (dir, _) = freshStore()
    PartitionedStore.compact(spark, dir, Seq("k"),
      targetBytes = 512L * 1024 * 1024)
    val mtimes = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("ym=")).flatMap(_.listFiles())
      .map(f => f.getName -> f.lastModified()).toMap
    val report = PartitionedStore.compact(spark, dir, Seq("k"),
      targetBytes = 512L * 1024 * 1024)
    assert(report.isEmpty, s"re-compaction should be a no-op: $report")
    val mtimes2 = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("ym=")).flatMap(_.listFiles())
      .map(f => f.getName -> f.lastModified()).toMap
    assert(mtimes === mtimes2)
  }
}
