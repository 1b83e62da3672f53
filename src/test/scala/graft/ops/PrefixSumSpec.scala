package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TestSpark

/** The distributed prefix sum must agree with the window form
  * `sum(v) OVER (PARTITION BY g ORDER BY o ROWS UNBOUNDED PRECEDING)`
  * on longs (exactly) and doubles (same left-to-right accumulation).
  */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("long values, several groups, many partitions") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 3000).map { i =>
      ("g" + (i % 4), i.toLong, rnd.nextInt(100).toLong)
    }.toDF("g", "o", "v").repartition(7)
    val viaOp = PrefixSum.withRunningSum(df, Seq("g"), Seq("o"), "v", "cum",
        partitions = 5)
      .select($"g", $"o", $"cum").as[(String, Long, Long)].collect().toSet
    val w = Window.partitionBy($"g").orderBy($"o")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWin = df.withColumn("cum", sum($"v").over(w))
      .select($"g", $"o", $"cum").as[(String, Long, Long)].collect().toSet
    assert(viaOp === viaWin)
  }

  test("double values accumulate in the same order as the window") {
    val rnd = new scala.util.Random(13)
    val df = (1 to 1000).map { i =>
      (i % 3, i.toLong, rnd.nextDouble())
    }.toDF("g", "o", "v").repartition(4)
    val viaOp = PrefixSum.withRunningSum(df, Seq("g"), Seq("o"), "v", "cum",
        partitions = 4)
      .select($"g", $"o", $"cum").as[(Int, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val w = Window.partitionBy($"g").orderBy($"o")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWin = df.withColumn("cum", sum($"v").over(w))
      .select($"g", $"o", $"cum").as[(Int, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(viaOp.keySet === viaWin.keySet)
    // identical accumulation ORDER ⇒ bit-identical doubles
    viaOp.foreach { case (k, v) => assert(v === viaWin(k), s"$k") }
  }

  test("single-row groups and a group spanning every partition") {
    val df = (Seq(("solo", 0L, 5L)) ++ (1L to 500L).map(i => ("big", i, 1L)))
      .toDF("g", "o", "v")
    val out = PrefixSum.withRunningSum(df, Seq("g"), Seq("o"), "v", "cum",
        partitions = 6)
      .select($"g", $"o", $"cum").as[(String, Long, Long)].collect()
    assert(out.find(_._1 == "solo").get._3 === 5L)
    val big = out.filter(_._1 == "big").sortBy(_._2)
    assert(big.map(_._3).toSeq === (1L to 500L).toSeq)
  }
}
