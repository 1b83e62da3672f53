package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MultiPatternSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hits(text: String, ps: Seq[String]): Int =
    new StringExpressions.AhoCorasick(ps).distinctHits(text)

  test("distinct patterns present, not occurrence count") {
    assert(hits("abab", Seq("ab")) === 1)
    assert(hits("abab", Seq("ab", "ba")) === 2)
    assert(hits("", Seq("x")) === 0)
    assert(hits("hello world", Seq("lo wo", "world", "hell")) === 3)
  }

  test("suffix patterns found via failure links") {
    // 'she' contains 'he' as a suffix — only reachable through the fail
    // transition, the case a naive trie walk misses
    assert(hits("she", Seq("she", "he", "hers")) === 2)
    assert(hits("ushers", Seq("she", "he", "hers")) === 3)
  }

  test("patterns sharing prefixes and overlapping matches") {
    assert(hits("aaa", Seq("a", "aa", "aaa", "aaaa")) === 3)
    assert(hits("abcde", Seq("abc", "bcd", "cde")) === 3)
  }

  test("matches |P| separate contains calls on the fixture corpus") {
    val ps = Seq("spark", "join", "merge", "the quick", "window")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"text".isNotNull)
    val viaAc = docs.select($"doc_id",
        StringExpressions.multiPatternHits($"text", ps).as("h"))
      .as[(Long, Int)].collect().toMap
    val viaContains = docs.select($"doc_id",
        ps.map(p => when($"text".contains(p), 1).otherwise(0))
          .reduce(_ + _).as("h"))
      .as[(Long, Int)].collect().toMap
    assert(viaAc === viaContains)
    assert(viaAc.values.sum > 0, "fixture should contain some patterns")
  }

  test("null text propagates") {
    val row = Seq(Option.empty[String]).toDF("t")
      .select(StringExpressions.multiPatternHits($"t", Seq("x")))
      .collect()(0)
    assert(row.isNullAt(0))
  }
}
