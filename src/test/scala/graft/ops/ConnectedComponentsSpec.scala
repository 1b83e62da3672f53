package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Min-label propagation + pointer jumping must label every vertex with its
  * component's minimum id — including on the worst case for propagation
  * (a long path) and on disconnected mixtures.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Runs BOTH paths — driver union-find (default threshold) and the
    * distributed iterative loop (threshold 0) — and asserts they agree
    * before returning; every test therefore pins path equivalence.
    */
  private def comps(edges: Seq[(Long, Long)],
                    maxIter: Int = 25): Map[Long, Long] = {
    val df = edges.toDF("a", "b")
    val driver = ConnectedComponents.run(df, "a", "b", maxIter)
      .as[(Long, Long)].collect().toMap
    val distributed = ConnectedComponents.run(df, "a", "b", maxIter,
        driverThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(driver === distributed, "driver and distributed paths disagree")
    driver
  }

  test("two cliques and a bridge pair") {
    val c1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val c2 = Seq((10L, 11L), (11L, 12L))
    val m = comps(c1 ++ c2 ++ Seq((20L, 21L)))
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long path converges (pointer jumping: O(log n) rounds)") {
    // path 0-1-2-...-63: naive propagation needs 63 rounds; with pointer
    // jumping maxIter 10 must suffice (2^10 >> 64)
    val path = (0L until 63L).map(i => (i, i + 1))
    val m = comps(path, maxIter = 10)
    assert(m.size === 64)
    assert(m.values.toSet === Set(0L))
  }

  test("edge direction and duplicates don't matter") {
    val m = comps(Seq((5L, 3L), (3L, 5L), (5L, 3L), (7L, 5L)))
    assert(m === Map(3L -> 3L, 5L -> 3L, 7L -> 3L))
  }

  test("self-loops are harmless") {
    val m = comps(Seq((4L, 4L), (4L, 9L)))
    assert(m === Map(4L -> 4L, 9L -> 4L))
  }

  test("string-id path graph of diameter > 2 (distributed path only)") {
    // String ids can't take the driver union-find path, and a sum-based
    // convergence test is null for them (null == null would declare
    // convergence after round one). A 9-hop path catches incomplete
    // propagation: every vertex must land on the lexicographic minimum.
    val path = (0 until 9).map(i => (f"doc_$i%02d", f"doc_${i + 1}%02d"))
    val m = ConnectedComponents.run(path.toDF("a", "b"), "a", "b",
        maxIter = 10, driverThreshold = 0)
      .as[(String, String)].collect().toMap
    assert(m.size === 10)
    assert(m.values.toSet === Set("doc_00"))
  }

  test("randomized graphs match brute-force reachability (both paths)") {
    val rnd = new scala.util.Random(2026)
    (1 to 5).foreach { trial =>
      val nV = 30 + rnd.nextInt(40)
      val nE = rnd.nextInt(60)
      val edges = (0 until nE).map { _ =>
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong)
      }.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        // brute force: repeated relaxation over the symmetric closure
        val adj = (edges ++ edges.map(_.swap))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
        var label = verts.map(v => v -> v).toMap
        var changed = true
        while (changed) {
          changed = false
          verts.foreach { v =>
            val m = (adj.getOrElse(v, Set.empty).map(label) + label(v)).min
            if (m < label(v)) { label += v -> m; changed = true }
          }
        }
        assert(comps(edges) === label, s"trial $trial (${edges.length} edges)")
      }
    }
  }
}
