package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential reference: all-adjacent (overlapping) pair counts, argmax
    * with (count desc, lexicographic) tie-break, greedy left-to-right
    * non-overlapping merge application.
    */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var state: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), w) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }
        out += ((r, a, b, w))
        state = state.map { case (syms, c) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toVector -> c
        }
      }
    }
    out.toSeq
  }

  private def trainOn(words: Map[String, Long], rounds: Int) = {
    val df = words.toSeq.toDF("w", "cnt")
    BpeTrain.train(df, "w", "cnt", rounds)
  }

  test("merges match the sequential reference on a mixed corpus") {
    val words = Map("lower" -> 5L, "lowest" -> 2L, "newer" -> 6L,
      "wider" -> 3L, "low" -> 7L)
    val (merges, _) = trainOn(words, 4)
    val ref = refBpe(words, 4)
    assert(merges.map(m => (m.round, m.symA, m.symB, m.weight)) === ref)
  }

  test("a == b chains merge greedily (run parity): aaaa -> aa aa") {
    val words = Map("aaaa" -> 1L, "aaa" -> 1L)
    val (merges, st) = trainOn(words, 1)
    assert(merges.head.symA === "a" && merges.head.symB === "a")
    // aaaa (3 adjacent pairs) + aaa (2) = weight 5
    assert(merges.head.weight === 5L)
    val out = st.orderBy("w", "pos").select("w", "sym")
      .as[(String, String)].collect().toSeq
    assert(out === Seq("aaa" -> "aa", "aaa" -> "a",
      "aaaa" -> "aa", "aaaa" -> "aa"))
  }

  test("ties break to the lexicographically smallest pair") {
    // "ab" and "cd" both occur twice; (a,b) < (c,d)
    val words = Map("abx" -> 1L, "yab" -> 1L, "cdx" -> 1L, "ycd" -> 1L)
    val (merges, _) = trainOn(words, 1)
    assert((merges.head.symA, merges.head.symB) === ("a", "b"))
    assert(merges.head.weight === 2L)
  }

  test("pairs run dry: single-char words stop the loop early") {
    val (merges, st) = trainOn(Map("a" -> 3L, "b" -> 2L), 3)
    assert(merges.isEmpty)
    assert(st.count() === 2L)
  }

  test("merged symbols participate in later rounds (multi-round ref)") {
    val words = Map("abab" -> 4L, "abc" -> 3L, "cab" -> 2L)
    val (merges, _) = trainOn(words, 3)
    val ref = refBpe(words, 3)
    assert(merges.map(m => (m.round, m.symA, m.symB, m.weight)) === ref)
    // round 1 merges (a,b); later rounds see "ab" as one symbol
    assert((merges.head.symA, merges.head.symB) === ("a", "b"))
  }

  test("n_pair_types shrinks as merges absorb pairs") {
    val words = Map("abab" -> 4L, "abc" -> 3L, "cab" -> 2L)
    val (merges, _) = trainOn(words, 2)
    assert(merges.size === 2)
    assert(merges(1).nPairTypes <= merges(0).nPairTypes + 2)
  }

  test("property: random corpora match the sequential reference (seeded)") {
    // deterministic seed — the property must reproduce on failure
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 8) {
      // small alphabet maximizes a==b chains and tie collisions —
      // exactly the branches the run-parity rule must get right
      val alphabet = "ab" + (if (trial % 2 == 0) "c" else "")
      val nWords = 3 + rnd.nextInt(10)
      val words = (1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.groupBy(identity).map { case (w, ws) =>
        w -> (ws.size.toLong * (1 + rnd.nextInt(3)))
      }
      val rounds = 1 + rnd.nextInt(4)
      val (merges, _) = trainOn(words, rounds)
      val ref = refBpe(words, rounds)
      assert(merges.map(m => (m.round, m.symA, m.symB, m.weight)) === ref,
        s"trial $trial words=$words rounds=$rounds")
    }
  }
}
