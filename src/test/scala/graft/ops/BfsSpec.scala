package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bounded-hop BFS (q124): layer correctness, hop cutoff, unreachable
  * vertices, frontier short-circuit on drain.
  */
class BfsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)], seeds: Seq[String],
                  hops: Int) =
    Bfs.kHopDistances(edges.toDF("a", "b"), "a", "b",
      seeds.toDF("v"), "v", hops)
      .orderBy("dist", "v").as[(String, Long)].collect().toSeq

  test("line graph: distance = index; maxHops truncates the tail") {
    val line = Seq("s" -> "x1", "x1" -> "x2", "x2" -> "x3", "x3" -> "x4")
    assert(run(line, Seq("s"), 4) ===
      Seq(("s", 0L), ("x1", 1L), ("x2", 2L), ("x3", 3L), ("x4", 4L)))
    assert(run(line, Seq("s"), 2) ===
      Seq(("s", 0L), ("x1", 1L), ("x2", 2L)))
  }

  test("shortest path wins over a longer alternative; cycles terminate") {
    // s->a->t (2 hops) and s->t direct (1 hop); t->s closes a cycle
    val g = Seq("s" -> "a", "a" -> "t", "s" -> "t", "t" -> "s")
    assert(run(g, Seq("s"), 4) === Seq(("s", 0L), ("a", 1L), ("t", 1L)))
  }

  test("disconnected vertices never appear; drained frontier stops early") {
    val g = Seq("s" -> "a", "z1" -> "z2")
    assert(run(g, Seq("s"), 4) === Seq(("s", 0L), ("a", 1L)))
  }

  test("multi-source: each vertex takes the nearest seed's layer") {
    val g = Seq("s1" -> "m", "s2" -> "m", "m" -> "far", "s2" -> "far")
    assert(run(g, Seq("s1", "s2"), 3) ===
      Seq(("s1", 0L), ("s2", 0L), ("far", 1L), ("m", 1L)))
  }
}
