package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

/** Deletion-neighborhood fuzzy join (q109) ≡ brute-force levenshtein. */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("equivalent to brute-force all-pairs at distance <= 1") {
    val rows = Seq("abc", "abd", "ab", "abcd", "ba", "xyz", "", "a", "b",
      "Customer#01", "Customer#02", "Customer#12", "customer#01")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("id", "s")
    val got = FuzzyJoin.editDistance1Pairs(df, "id", "s")
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      (i, a) <- rows; (j, b) <- rows if i < j
      d = levenshteinRef(a, b) if d <= 1
    } yield (i, j, d.toLong)).toSet
    assert(got === brute)
    // sanity on the fixture: insert, delete, substitution, and the
    // shared-variant-but-distance-2 reject are all exercised
    assert(brute.contains((0L, 1L, 1L))) // abc ~ abd (sub)
    assert(brute.contains((0L, 2L, 1L))) // abc ~ ab  (del)
    assert(brute.contains((0L, 3L, 1L))) // abc ~ abcd (ins)
    assert(brute.contains((6L, 7L, 1L))) // "" ~ a
    assert(!brute.exists(p => p._1 == 0L && p._2 == 4L)) // abc vs ba
  }

  test("null strings follow the empty-string convention") {
    val df = Seq((1L, null: String), (2L, "x"), (3L, "")).toDF("id", "s")
    val got = FuzzyJoin.editDistance1Pairs(df, "id", "s")
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 1L), (1L, 3L, 0L), (2L, 3L, 1L)))
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
