package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Degree-oriented triangle counting (q114) ≡ brute-force triple
  * enumeration on random graphs; cleanup of dirty edge lists.
  */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(p => p._1 != p._2)
    val vs = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val tri = for {
      a <- vs; b <- vs if a < b && e((a, b))
      c <- vs if b < c && e((b, c)) && e((a, c))
    } yield (a, b, c)
    tri.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).map { case (v, l) => v -> l.size.toLong }
  }

  test("known graph: K4 plus a pendant edge") {
    // K4 has 4 triangles; each vertex sits in 3; pendant vertex in none
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val got = Triangles.perVertexSupport(
        (k4 :+ ((3L, 9L))).toDF("x", "y"), "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("property: == brute force on random graphs; dirty input cleaned (10 seeded trials)") {
    for (trial <- 0 until 10) {
      val rng = new scala.util.Random(4000 + trial)
      val n = 12
      val base = for {
        a <- 0L until n; b <- 0L until n if a < b && rng.nextDouble() < 0.35
      } yield (a, b)
      // dirt: reversed duplicates and self-loops must not change counts
      val dirty = base ++ base.take(5).map(_.swap) ++ Seq((1L, 1L), (2L, 2L))
      val got = Triangles.perVertexSupport(dirty.toDF("x", "y"), "x", "y")
        .as[(Long, Long)].collect().toMap
      assert(got === brute(base.toSet), s"trial $trial")
    }
  }

  private def bruteEdges(edges: Set[(Long, Long)]): Map[(Long, Long), Long] = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(p => p._1 != p._2)
    val vs = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val tri = for {
      a <- vs; b <- vs if a < b && e((a, b))
      c <- vs if b < c && e((b, c)) && e((a, c))
    } yield (a, b, c)
    tri.flatMap { case (a, b, c) => Seq((a, b), (a, c), (b, c)) }
      .groupBy(identity).map { case (p, l) => p -> l.size.toLong }
  }

  test("perEdgeSupport == brute force; sum of supports = 3 x triangles (10 seeded trials)") {
    for (trial <- 0 until 10) {
      val rng = new scala.util.Random(5000 + trial)
      val n = 12
      val base = for {
        a <- 0L until n; b <- 0L until n if a < b && rng.nextDouble() < 0.35
      } yield (a, b)
      val dirty = base ++ base.take(4).map(_.swap) ++ Seq((3L, 3L))
      val got = Triangles.perEdgeSupport(dirty.toDF("x", "y"), "x", "y")
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val want = bruteEdges(base.toSet)
      assert(got === want, s"trial $trial")
      val triTotal = Triangles.perVertexSupport(base.toDF("x", "y"), "x", "y")
        .as[(Long, Long)].collect().map(_._2).sum
      assert(got.values.sum === triTotal, s"trial $trial edge-sum")
    }
  }
}
