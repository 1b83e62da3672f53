package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class StringExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(a: String, b: String): Int = StringExpressions.distance(a, b)

  test("full Damerau-Levenshtein, not the OSA restriction") {
    // the discriminating case: OSA forbids edits after a transposition
    // and answers 3; full DL (and DuckDB's damerau_levenshtein) says 2
    assert(d("CA", "ABC") === 2)
    assert(d("ABC", "CA") === 2)
  }

  test("known distances") {
    assert(d("", "") === 0)
    assert(d("", "abc") === 3)
    assert(d("abc", "") === 3)
    assert(d("abc", "abc") === 0)
    assert(d("ab", "ba") === 1)            // one transposition
    assert(d("abcdef", "abdcef") === 1)    // interior transposition
    assert(d("kitten", "sitting") === 3)   // classic levenshtein case
    assert(d("small ring", "small rings") === 1)
    assert(d("a cat", "a abct") === 2)     // full-DL textbook case
  }

  test("symmetry and triangle spot-checks") {
    val ws = Seq("ring", "rign", "rings", "wring", "thing", "")
    for (a <- ws; b <- ws) {
      assert(d(a, b) === d(b, a), s"symmetry $a/$b")
      assert((d(a, b) == 0) === (a == b), s"identity $a/$b")
    }
  }

  test("column expression matches the reference implementation") {
    val pairs = Seq(("CA", "ABC"), ("ab", "ba"), ("kitten", "sitting"),
      ("small ring", "small rign"), ("", "x"))
    val got = pairs.toDF("a", "b")
      .select(StringExpressions.damerauLevenshtein($"a", $"b"))
      .as[Int].collect().toSeq
    assert(got === pairs.map { case (a, b) => d(a, b) })
  }

  test("nulls propagate") {
    val got = Seq((Option("x"), Option.empty[String]))
      .toDF("a", "b")
      .select(StringExpressions.damerauLevenshtein($"a", $"b"))
      .collect()(0)
    assert(got.isNullAt(0))
  }
}
