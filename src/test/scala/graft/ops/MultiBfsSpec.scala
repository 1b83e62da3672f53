package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

import scala.collection.mutable

/** Per-source bounded BFS (q204): agreement with a sequential per-source
  * reference on random graphs, hop cutoff, and per-source isolation
  * (one source's expansion can never leak into another's ball).
  */
class MultiBfsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)], sources: Seq[String],
                  hops: Int): Map[(String, String), Long] =
    MultiBfs.perSourceDistances(edges.toDF("a", "b"), "a", "b",
      sources.toDF("v"), "v", hops)
      .as[(String, String, Long)].collect()
      .map { case (s, v, d) => (s, v) -> d }.toMap

  /** Sequential reference: BFS from each source independently. */
  private def reference(edges: Seq[(String, String)], sources: Seq[String],
                        hops: Int): Map[(String, String), Long] = {
    val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    sources.distinct.flatMap { s =>
      val dist = mutable.Map(s -> 0L)
      var frontier = Seq(s)
      var h = 1L
      while (h <= hops && frontier.nonEmpty) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Nil))
          .distinct.filterNot(dist.contains)
        next.foreach(v => dist(v) = h)
        frontier = next
        h += 1
      }
      dist.map { case (v, d) => (s, v) -> d }
    }.toMap
  }

  test("matches the sequential per-source reference on a random digraph") {
    val rnd = new scala.util.Random(42)
    val vs = (0 until 30).map(i => s"v$i")
    val edges = Seq.fill(80)(
      (vs(rnd.nextInt(vs.size)), vs(rnd.nextInt(vs.size))))
      .filter { case (a, b) => a != b }.distinct
    val srcs = vs.take(12)
    for (hops <- Seq(0, 1, 3)) {
      assert(run(edges, srcs, hops) === reference(edges, srcs, hops),
        s"hops=$hops")
    }
  }

  test("sources expand independently: disjoint components stay disjoint") {
    val g = Seq("a1" -> "a2", "a2" -> "a3", "b1" -> "b2")
    val got = run(g, Seq("a1", "b1"), 5)
    assert(got === Map(
      ("a1", "a1") -> 0L, ("a1", "a2") -> 1L, ("a1", "a3") -> 2L,
      ("b1", "b1") -> 0L, ("b1", "b2") -> 1L))
  }

  test("hop bound truncates every source's ball at the same radius") {
    val line = Seq("s" -> "x1", "x1" -> "x2", "x2" -> "x3")
    val got = run(line, Seq("s", "x1"), 2)
    assert(got === Map(
      ("s", "s") -> 0L, ("s", "x1") -> 1L, ("s", "x2") -> 2L,
      ("x1", "x1") -> 0L, ("x1", "x2") -> 1L, ("x1", "x3") -> 2L))
  }
}
