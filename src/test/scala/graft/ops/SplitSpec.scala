package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

/** Deterministic split assignment (q108): exhaustive/disjoint labels,
  * stability under growth and repartitioning, fraction accuracy.
  */
class SplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def keys(n: Int) = (0L until n.toLong).toDF("k")

  test("every row gets exactly one label; fractions land near targets") {
    val got = Split.assign(keys(2000), "k")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(got.values.sum === 2000L)
    assert(got.keySet === Set("train", "val", "test"))
    // md5 is uniform; 2000 draws at p=0.9 → sd ≈ 13, allow ±5 sd.
    assert(math.abs(got("train") - 1800L) < 70)
    assert(math.abs(got("val") - 100L) < 70)
  }

  test("assignment is a pure function of (salt, key): growth never moves a row") {
    val small = Split.assign(keys(500), "k").as[(Long, String)].collect().toMap
    val big = Split.assign(keys(2000), "k").as[(Long, String)].collect().toMap
    assert(small.forall { case (k, s) => big(k) == s })
    // and a different salt produces a different (not shifted) assignment
    val resalted = Split.assign(keys(500), "k", salt = "v2")
      .as[(Long, String)].collect().toMap
    assert(small.exists { case (k, s) => resalted(k) != s })
  }

  test("repartitioning does not change labels") {
    val base = Split.assign(keys(300), "k").as[(Long, String)].collect().toMap
    val shuffled = Split.assign(keys(300).repartition(7, col("k")), "k")
      .as[(Long, String)].collect().toMap
    assert(base === shuffled)
  }

  test("custom fractions: last band absorbs the remainder") {
    val got = Split.assign(keys(1000), "k",
        fractions = Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(got.keySet === Set("a", "b", "c"))
    assert(got.values.sum === 1000L)
    intercept[IllegalArgumentException] {
      Split.assign(keys(10), "k", fractions = Seq("a" -> 0.5, "b" -> 0.4))
    }
  }
}
