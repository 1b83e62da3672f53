package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Corpus-level span dedup (q75): fixed-width token spans, corpus document
  * frequency, strip-common reassembly.
  */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toks(s: String) = s.split(" ").toSeq

  test("spanArray cuts non-overlapping width-w spans incl. short tail") {
    val df = Seq(
      (1L, toks("a b c d e")),
      (2L, toks("a b")),
      (3L, Seq.empty[String])
    ).toDF("id", "toks")
    val out = df.select($"id", SpanDedup.spanArray($"toks", 2).as("sp"))
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq
    assert(out === Seq(
      (1L, Seq("a b", "c d", "e")),
      (2L, Seq("a b")),
      (3L, Seq.empty[String])))
  }

  test("unique text passes through untouched; shared spans dropped from all docs") {
    // docs 1 and 2 share their first 4 tokens (one width-4 span);
    // doc 3 is entirely unique.
    val df = Seq(
      (1L, toks("the same old header unique one x y")),
      (2L, toks("the same old header other two p q")),
      (3L, toks("completely unrelated words here again now"))
    ).toDF("doc_id", "toks")
    val out = SpanDedup.dedupSpans(df, "doc_id", "toks", width = 4, maxDf = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "dropped_spans", "kept_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 1L, "unique one x y"),
      (2L, 2L, 1L, "other two p q"),
      (3L, 2L, 0L, "completely unrelated words here again now")))
  }

  test("all-dropped document yields empty kept_text, not null") {
    val df = Seq(
      (1L, toks("a b c d")),
      (2L, toks("a b c d"))
    ).toDF("doc_id", "toks")
    val out = SpanDedup.dedupSpans(df, "doc_id", "toks", width = 4, maxDf = 2)
      .orderBy("doc_id").select("kept_text").as[String].collect().toSeq
    assert(out === Seq("", ""))
  }

  test("broadcast variant == exact join, on fixtures and the real corpus") {
    val hand = Seq(
      (1L, toks("the same old header unique one x y")),
      (2L, toks("the same old header other two p q")),
      (3L, toks("completely unrelated words here again now"))
    ).toDF("doc_id", "toks")
    for (df <- Seq(hand)) {
      val a = SpanDedup.dedupSpans(df, "doc_id", "toks", 4, 2)
      val b = SpanDedup.dedupSpansBroadcast(df, "doc_id", "toks", 4, 2)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    }
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id",
        graft.functions.TextFunctions.tokens($"text").as("toks"))
    val a = SpanDedup.dedupSpans(corpus, "doc_id", "toks", 8, 2)
    val b = SpanDedup.dedupSpansBroadcast(corpus, "doc_id", "toks", 8, 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("broadcast variant fails loud past the common-span budget") {
    val df = Seq((1L, toks("a b c d")), (2L, toks("a b c d"))).toDF("doc_id", "toks")
    val e = intercept[IllegalArgumentException] {
      SpanDedup.dedupSpansBroadcast(df, "doc_id", "toks", 2, 2, maxCommonSpans = 0L)
    }
    assert(e.getMessage.contains("broadcast budget"))
  }

  test("a span repeated WITHIN one doc only is kept (df counts documents)") {
    val df = Seq(
      (1L, toks("x y x y")),           // span "x y" occurs twice, same doc
      (2L, toks("totally different"))
    ).toDF("doc_id", "toks")
    val out = SpanDedup.dedupSpans(df, "doc_id", "toks", width = 2, maxDf = 2)
      .orderBy("doc_id").select("kept_text").as[String].collect().toSeq
    assert(out === Seq("x y x y", "totally different"))
  }
}
