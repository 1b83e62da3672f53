package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Greedy MMR diversification (q122): relevance-vs-redundancy trade,
  * integer-exact selection, per-query independence.
  */
class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(cands: Seq[(String, Long, Long)],
                  sims: Seq[(String, Long, Long, Long)], k: Int) =
    Mmr.diversify(cands.toDF("q", "id", "rel"),
      sims.toDF("q", "id", "id_b", "sim"),
      "q", "id", "rel", "id_b", "sim", k)
      .orderBy("q", "step")
      .as[(String, Long, Long, Int)].collect().toSeq

  private def sym(s: (String, Long, Long, Long)*) =
    s.flatMap { case (q, a, b, v) => Seq((q, a, b, v), (q, b, a, v)) }

  test("redundant near-duplicate of the top pick loses to a diverse item") {
    // A rel=100; B rel=99 but sim(B,A)=90; C rel=50, dissimilar.
    // Pure top-k keeps (A,B); MMR step2 scores B: 99-90=9, C: 50-0=50 -> C.
    val got = run(
      Seq(("q", 1L, 100L), ("q", 2L, 99L), ("q", 3L, 50L)),
      sym(("q", 1L, 2L, 90L), ("q", 1L, 3L, 0L), ("q", 2L, 3L, 5L)), k = 3)
    assert(got.map(_._2) === Seq(1L, 3L, 2L))
    assert(got.map(_._4) === Seq(1, 2, 3))
  }

  test("maxsim is vs the WHOLE picked set, not just the last pick") {
    // D is far from A (picked 1st) but identical to C (picked 2nd):
    // step3 must score D by sim to C, eliminating it.
    val got = run(
      Seq(("q", 1L, 100L), ("q", 2L, 80L), ("q", 3L, 79L), ("q", 4L, 10L)),
      sym(("q", 1L, 2L, 0L), ("q", 1L, 3L, 0L), ("q", 1L, 4L, 0L),
        ("q", 2L, 3L, 78L), ("q", 2L, 4L, 0L), ("q", 3L, 4L, 0L)), k = 3)
    // step2: B(80) vs C(79) -> B; step3: C scores 79-78=1, E absent, D 10-0=10
    assert(got.map(_._2) === Seq(1L, 2L, 4L))
  }

  test("ties break to the smallest id at every step") {
    val got = run(
      Seq(("q", 7L, 50L), ("q", 3L, 50L), ("q", 9L, 50L)),
      sym(("q", 3L, 7L, 0L), ("q", 3L, 9L, 0L), ("q", 7L, 9L, 0L)), k = 3)
    assert(got.map(_._2) === Seq(3L, 7L, 9L))
  }

  test("queries diversify independently; short lists stop early") {
    val got = run(
      Seq(("a", 1L, 10L), ("a", 2L, 5L), ("b", 8L, 3L)),
      sym(("a", 1L, 2L, 0L)), k = 3)
    assert(got === Seq(("a", 1L, 10L, 1), ("a", 2L, 5L, 2), ("b", 8L, 3L, 1)))
  }
}
