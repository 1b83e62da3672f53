package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ShortestPathSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.TestSpark.spark
  import spark.implicits._

  private def paths(edges: Seq[(String, String, Long)], src: String,
                    rounds: Int): Map[String, Long] = {
    val e = edges.toDF("s", "d", "w")
    val s = Seq(src).toDF("v")
    ShortestPath.boundedPaths(e, "s", "d", "w", s, rounds)
      .as[(String, Long)].collect().toMap
  }

  // a --1-- b --1-- c --1-- d, plus a direct a--10--d shortcut-buster and
  // a cheap long way around: a-e-f-d at 1+1+1.
  private val g = Seq(
    ("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L),
    ("a", "d", 10L),
    ("a", "e", 1L), ("e", "f", 1L), ("f", "d", 1L))

  test("bounded rounds = exact shortest distance over <= k edges") {
    // 1 round: only direct edges from a.
    assert(paths(g, "a", 1) ===
      Map("a" -> 0L, "b" -> 1L, "d" -> 10L, "e" -> 1L))
    // 3 rounds: both 3-edge paths to d (cost 3) beat the direct 10.
    val r3 = paths(g, "a", 3)
    assert(r3("d") === 3L)
    assert(r3 === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L,
      "e" -> 1L, "f" -> 2L))
  }

  test("distances never increase with more rounds") {
    val r2 = paths(g, "a", 2)
    val r4 = paths(g, "a", 4)
    assert(r2.keySet.subsetOf(r4.keySet))
    r2.foreach { case (v, d) => assert(r4(v) <= d) }
  }

  test("parallel edges collapse to the cheapest; multi-source takes nearest seed") {
    val e = Seq(("a", "b", 5L), ("a", "b", 2L), ("c", "b", 1L)).toDF("s", "d", "w")
    val multi = ShortestPath
      .boundedPaths(e, "s", "d", "w", Seq("a", "c").toDF("v"), 2)
      .as[(String, Long)].collect().toMap
    assert(multi === Map("a" -> 0L, "c" -> 0L, "b" -> 1L))
  }

  test("negative weights fail loud") {
    val e = Seq(("a", "b", -1L)).toDF("s", "d", "w")
    intercept[IllegalArgumentException] {
      ShortestPath.boundedPaths(e, "s", "d", "w", Seq("a").toDF("v"), 2)
    }
  }
}
