package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Deterministic synchronous LPA (q134): ≡ sequential reference,
  * community separation on a bridged-cliques graph, no-in-edge keep rule,
  * run-to-run determinism.
  */
class LabelPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)], rounds: Int) =
    LabelProp.communities(edges.toDF("a", "b"), "a", "b", rounds)
      .as[(String, String)].collect().toMap

  /** Sequential replay of the exact same recurrence. */
  private def ref(edges: Seq[(String, String)], rounds: Int): Map[String, String] = {
    val vs = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var lab = vs.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      val next = vs.map { v =>
        val nbrLabs = edges.collect { case (a, b) if b == v => lab(a) }
        if (nbrLabs.isEmpty) v -> lab(v)
        else {
          val byLab = nbrLabs.groupBy(identity).view.mapValues(_.size)
          val mx = byLab.values.max
          v -> byLab.collect { case (l, c) if c == mx => l }.min
        }
      }.toMap
      lab = next
    }
    lab
  }

  private def sym(e: Seq[(String, String)]) = (e ++ e.map(_.swap)).distinct

  test("bridged cliques: each clique converges to one label, labels differ") {
    val cliqueA = Seq("a1" -> "a2", "a1" -> "a3", "a2" -> "a3")
    val cliqueB = Seq("b1" -> "b2", "b1" -> "b3", "b2" -> "b3")
    val g = sym(cliqueA ++ cliqueB :+ ("a3" -> "b1"))
    val got = run(g, 4)
    assert(got === ref(g, 4))
    val aLabs = Set("a1", "a2", "a3").map(got)
    val bLabs = Set("b1", "b2").map(got) // b1 sits on the bridge
    assert(aLabs.size === 1)
    assert(bLabs.size === 1)
    assert(aLabs != bLabs)
  }

  test("directed: a vertex with no in-edges keeps its own label") {
    val g = Seq("src" -> "x", "x" -> "y")
    val got = run(g, 2)
    assert(got === ref(g, 2))
    assert(got("src") === "src")
  }

  test("deterministic across runs and equal to reference on a random graph") {
    val rnd = new scala.util.Random(99)
    val g = sym(Seq.fill(60)((s"v${rnd.nextInt(12)}", s"v${rnd.nextInt(12)}"))
      .filter(e => e._1 != e._2)).distinct
    val r1 = run(g, 3)
    val r2 = run(g, 3)
    assert(r1 === r2)
    assert(r1 === ref(g, 3))
  }
}
