package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Variable-length repeated-span dedup (q358): window-union exactness vs a
  * brute-force reference, interval merging, within-doc repeats.
  */
class RepeatedSpansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toks(s: String) = s.split(" ").toSeq

  /** Brute-force reference: literal w-window counts, mark covered
    * positions, merge into stretches — the definition, executed naively.
    */
  private def brute(docs: Seq[(Long, Seq[String])], w: Int)
      : Seq[(Long, Long, Long, Long, Long, Long, Long, Long, String)] = {
    val wins = docs.flatMap { case (id, ts) =>
      (0 to ts.length - w).map(i => (id, i + 1, ts.slice(i, i + w).mkString(" ")))
    }
    val cnt = wins.groupBy(_._3).map { case (k, v) => k -> v.size }
    docs.map { case (id, ts) =>
      val dupStarts = wins.filter(x => x._1 == id && cnt(x._3) >= 2)
        .map(_._2).sorted
      val covered = dupStarts.flatMap(p => p until (p + w)).toSet
      // maximal stretches of covered positions
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      covered.toSeq.sorted.foreach { p =>
        if (spans.nonEmpty && spans.last._2 + 1 == p)
          spans(spans.size - 1) = (spans.last._1, p)
        else spans += ((p, p))
      }
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !covered.contains(i + 1) => t
      }
      val lens = spans.map { case (s, e) => e - s + 1 }
      (id, ts.length.toLong, dupStarts.size.toLong, spans.size.toLong,
        lens.sum.toLong, if (lens.isEmpty) 0L else lens.max.toLong,
        if (ts.isEmpty) 0L else lens.sum.toLong * 1000000L / ts.length,
        kept.size.toLong, kept.mkString(" "))
    }
  }

  // operator column order matches the brute tuple exactly:
  // (id, n_tok, n_dup_windows, n_spans, covered_tokens, max_span_len,
  //  removed_ppm, tokens_kept, kept_text)
  private def run(docs: Seq[(Long, Seq[String])], w: Int) =
    RepeatedSpans.dedupStats(docs.toDF("doc_id", "toks"),
        "doc_id", "toks", w)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().toSeq

  test("cross-doc suffix splice, within-doc repeat, unique doc") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      1L -> toks(a),                                // shares suffix with 2
      2L -> toks(a).drop(2),                        // suffix splice of 1
      3L -> (toks("p q r s t u v w") ++ toks("p q r s t u v w")), // self-repeat
      4L -> toks("one two three four five six seven eight"),      // unique
      5L -> toks("tiny doc"))                       // shorter than w
    val got = run(docs, 4)
    val want = brute(docs, 4)
    assert(got === want)
    val byId = got.map(g => g._1 -> g).toMap
    // doc 2 is a pure suffix of doc 1: everything in doc 2 is removed
    assert(byId(2L)._8 === 0L, "splice doc should be fully removed")
    // the self-repeating doc loses everything (both halves repeat)
    assert(byId(3L)._8 === 0L)
    // the unique doc keeps everything
    assert(byId(4L)._7 === 0L)
    assert(byId(5L)._3 === 0L, "short doc has no windows")
  }

  test("adjacent distinct repeated spans fuse into one stretch") {
    // doc 30 contains doc 10's span immediately followed by doc 20's:
    // two different repeated 3-spans, one merged 6-token stretch.
    val docs = Seq(
      10L -> toks("a b c x1 x2 x3 x4"),
      20L -> toks("d e f y1 y2 y3 y4"),
      30L -> toks("a b c d e f z1 z2 z3"))
    val got = run(docs, 3)
    assert(got === brute(docs, 3))
    val d30 = got.find(_._1 == 30L).get
    assert(d30._4 === 1L, "two adjacent repeated spans must merge")
    assert(d30._5 === 6L)
    assert(d30._9 === "z1 z2 z3")
  }

  test("property: window-union equals brute force on seeded random corpora") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val vocab = Vector("aa", "bb", "cc", "dd")
      val docs = (1L to 24L).map { id =>
        id -> Vector.fill(2 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size)))
      }
      assert(run(docs.map { case (i, t) => (i, t: Seq[String]) }, 3)
        === brute(docs.map { case (i, t) => (i, t: Seq[String]) }, 3))
    }
  }
}
