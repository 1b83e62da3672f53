package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Bm25.topK edge behavior — the score math itself is oracled end-to-end
  * (q77/q96); these pin the shape contracts.
  */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("empty corpus returns the empty frame with (id, score) schema, not a crash") {
    val docs = Seq.empty[(Long, Seq[String])].toDF("doc_id", "toks")
    val out = Bm25.topK(docs, "doc_id", "toks", terms = Seq("x", "y"), k = 5)
    assert(out.columns.toSeq === Seq("doc_id", "score"))
    assert(out.count() === 0L)
  }

  test("docs without any query term are absent; scores ranked desc with id tie-break") {
    val docs = Seq(
      (1L, Seq("spark", "query", "spark")),
      (2L, Seq("table", "row")),
      (3L, Seq("spark", "table"))
    ).toDF("doc_id", "toks")
    val out = Bm25.topK(docs, "doc_id", "toks", terms = Seq("spark"), k = 10)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 3L))   // doc 2 never matches
    assert(out.head._2 > out(1)._2)          // tf=2 beats tf=1
  }
}
