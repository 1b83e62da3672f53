package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ArgExtremumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("max score wins; ties break to the smallest key (long keys)") {
    val df = Seq(
      ("g1", 3L, 10L), ("g1", 3L, 7L), ("g1", 2L, 1L),
      ("g2", 1L, 5L),
      ("g3", 4L, 9L), ("g3", 4L, 9L)).toDF("g", "c", "k")
    val out = df.groupBy($"g")
      .agg(ArgExtremum.maxScoreMinKey($"c", $"k").as("k"))
      .orderBy($"g").as[(String, Long)].collect()
    assert(out.toSeq === Seq(("g1", 7L), ("g2", 5L), ("g3", 9L)))
  }

  test("string keys order lexicographically on ties") {
    val df = Seq((1L, 2L, "beta"), (1L, 2L, "alpha"), (1L, 1L, "aa"))
      .toDF("g", "c", "k")
    val out = df.groupBy($"g")
      .agg(ArgExtremum.maxScoreMinKey($"c", $"k").as("k"))
      .as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "alpha")))
  }

  test("null score/key rows are skipped; all-null group yields NULL") {
    val df = Seq(
      (1L, Some(5L), Option.empty[String]), (1L, None, Some("x")),
      (1L, Some(2L), Some("kept")),
      (2L, None, None)).toDF("g", "c", "k")
    val out = df.groupBy($"g")
      .agg(ArgExtremum.maxScoreMinKey($"c", $"k").as("k"))
      .orderBy($"g").as[(Long, Option[String])].collect()
    assert(out.toSeq === Seq((1L, Some("kept")), (2L, None)))
  }

  test("partition-split invariance (map-side partials merge correctly)") {
    val rows = (1 to 1000).map(i => (i % 7L, (i % 13).toLong, i.toLong))
    val one = rows.toDF("g", "c", "k").coalesce(1)
      .groupBy($"g").agg(ArgExtremum.maxScoreMinKey($"c", $"k").as("k"))
      .orderBy($"g").as[(Long, Long)].collect().toSeq
    val many = rows.toDF("g", "c", "k").repartition(17)
      .groupBy($"g").agg(ArgExtremum.maxScoreMinKey($"c", $"k").as("k"))
      .orderBy($"g").as[(Long, Long)].collect().toSeq
    val ref = rows.groupBy(_._1).view.mapValues { rs =>
      val mx = rs.map(_._2).max
      rs.filter(_._2 == mx).map(_._3).min
    }.toSeq.sortBy(_._1)
    assert(one === ref)
    assert(many === ref)
  }
}
