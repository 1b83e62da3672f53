package graft.functions

import graft.TestSpark
import graft.ops.BpeTrain
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the train/encode contract: applying the learned merge list to the
  * TRAINING corpus reproduces the trainer's final positional state
  * verbatim — the guarantee that makes BpeEncode the trainer's inference
  * half rather than a lookalike (greedy linear scan ≡ the trainer's
  * run-parity rule, argued in the expression scaladoc, checked here on
  * the chaining a==b shape, ties, unicode, and random corpora).
  */
class BpeEncodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** encode(w) for every training word vs the trainer's final state. */
  private def encodeMatchesFinalState(words: Map[String, Long],
                                      rounds: Int): Unit = {
    val df = words.toSeq.toDF("w", "cnt")
    val (merges, st) = BpeTrain.train(df, "w", "cnt", rounds)
    val fromState: Map[String, Seq[String]] = st
      .orderBy("w", "pos").select("w", "sym")
      .as[(String, String)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val encoded: Map[String, Seq[String]] = df
      .select($"w", BpeFunctions.bpeEncode($"w",
        merges.map(m => (m.symA, m.symB))).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(encoded.keySet === fromState.keySet)
    encoded.foreach { case (w, syms) =>
      assert(syms === fromState(w), s"word '$w'")
    }
  }

  test("encode(training corpus) == trainer final state (mixed corpus)") {
    encodeMatchesFinalState(Map("lower" -> 5L, "lowest" -> 2L,
      "newer" -> 6L, "wider" -> 3L, "low" -> 7L), 4)
  }

  test("a == b chains: greedy scan matches run parity (aaaa/aaa/aaaaa)") {
    encodeMatchesFinalState(
      Map("aaaa" -> 1L, "aaa" -> 2L, "aaaaa" -> 1L, "baab" -> 1L), 2)
  }

  test("unicode words symbolize per code point, like split('')") {
    encodeMatchesFinalState(
      Map("héllo" -> 3L, "héllé" -> 2L, "日本語" -> 2L, "日本" -> 1L), 3)
  }

  test("encode(training corpus) == final state on random corpora") {
    val rnd = new scala.util.Random(4242)
    (1 to 5).foreach { _ =>
      val words = (1 to 12).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString ->
          (1L + rnd.nextInt(9))
      }.toMap
      encodeMatchesFinalState(words, 4)
    }
  }

  test("unseen words encode with the learned merges only") {
    val (merges, _) = BpeTrain.train(
      Seq(("abab", 5L), ("abc", 3L)).toDF("w", "cnt"), "w", "cnt", 2)
    val pairs = merges.map(m => (m.symA, m.symB))
    // round 1 merges (a,b) (weight 13), round 2 merges (ab,ab) (5 > 3 of
    // (ab,c)); unseen "ababab" → [ab,ab,ab] → greedy [abab, ab]
    val out = Seq("ababab", "ba", "xyz").toDF("w")
      .select($"w", BpeFunctions.bpeEncode($"w", pairs).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert((merges.head.symA, merges.head.symB) === ("a", "b"))
    assert(out("ababab") === Seq("abab", "ab"))
    assert(out("ba") === Seq("b", "a"))
    assert(out("xyz") === Seq("x", "y", "z"))
  }

  test("empty merge list returns the code-point split; null stays null") {
    val out = Seq(Some("abc"), None).toDF("w")
      .select(BpeFunctions.bpeEncode($"w", Seq.empty).as("syms"))
      .as[Option[Seq[String]]].collect().toSeq
    assert(out === Seq(Some(Seq("a", "b", "c")), None))
  }

  test("interpreted eval agrees with codegen") {
    val words = Seq("abab", "aaa", "ba").toDF("w")
    val pairs = Seq(("a", "b"), ("ab", "ab"))
    val viaCodegen = words
      .select($"w", BpeFunctions.bpeEncode($"w", pairs).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    val expr = BpeFunctions.BpeEncode(
      org.apache.spark.sql.catalyst.expressions.Literal("abab"), pairs)
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toSeq[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString)
    assert(interp === viaCodegen("abab"))
    assert(interp === Seq("abab"))
  }
}
