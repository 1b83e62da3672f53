package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The round-7 iterative graph operators against sequential in-memory
  * replays of their integer recurrences on random graphs — the same
  * bit-identical-across-partitionings claim PageRankSpec pins.
  */
class HitsKCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Hits.ranks' recurrence, replayed sequentially (BigInt stands in for
    * the operator's DECIMAL(38,0) raw sums).
    */
  private def hitsReference(edges: Set[(Long, Long)], iterations: Int,
                            scale: Long = 1000000000000L)
      : Map[Long, (Long, Long)] = {
    val e = edges.filter(p => p._1 != p._2)
    val verts = e.flatMap(p => Seq(p._1, p._2))
    var hub: Map[Long, Long] = verts.map(_ -> scale).toMap
    var auth: Map[Long, Long] = Map.empty
    for (_ <- 0 until iterations) {
      val aRaw = e.toSeq.map { case (s, d) => d -> BigInt(hub(s)) }
        .groupBy(_._1).map { case (d, l) => d -> l.map(_._2).sum }
      val am = aRaw.values.max
      auth = verts.map(v =>
        v -> (aRaw.getOrElse(v, BigInt(0)) * scale / am).toLong).toMap
      val hRaw = e.toSeq.map { case (s, d) => s -> BigInt(auth(d)) }
        .groupBy(_._1).map { case (s, l) => s -> l.map(_._2).sum }
      val hm = hRaw.values.max
      hub = verts.map(v =>
        v -> (hRaw.getOrElse(v, BigInt(0)) * scale / hm).toLong).toMap
    }
    verts.map(v => v -> (auth(v), hub(v))).toMap
  }

  /** KCore.peel replayed sequentially: `rounds` synchronous peels. */
  private def kcoreReference(edges: Set[(Long, Long)], k: Int,
                             rounds: Int): Map[Long, Long] = {
    var e = edges.flatMap(p => Seq(p, p.swap)).filter(p => p._1 != p._2)
    for (_ <- 0 until rounds) {
      val deg = e.groupBy(_._1).map { case (v, l) => v -> l.size }
      val live = deg.collect { case (v, d) if d >= k => v }.toSet
      e = e.filter(p => live(p._1) && live(p._2))
    }
    e.groupBy(_._1).map { case (v, l) => v -> l.size.toLong }
  }

  test("HITS on a chain: interior vertices split hub/authority roles") {
    // 1 -> 2 -> 3: vertex 1 is the pure hub, 3 the pure authority
    val got = Hits.ranks(Seq((1L, 2L), (2L, 3L)).toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(3L)._1 === 1000000000000L)       // max auth anchor
    assert(got(1L)._1 === 0L)                   // no in-edges
    assert(got(3L)._2 === 0L)                   // no out-edges
    assert(got(1L)._2 > 0L)
  }

  test("HITS property: == sequential BigInt recurrence (8 seeded trials)") {
    for (trial <- 0 until 8) {
      val rng = new scala.util.Random(7200 + trial)
      val n = 12
      val edges = (for {
        a <- 0L until n; b <- 0L until n
        if a != b && rng.nextDouble() < 0.18
      } yield (a, b)).toSet
      if (edges.nonEmpty) {
        val got = Hits.ranks(edges.toSeq.toDF("s", "d"), "s", "d",
            iterations = 3)
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
        assert(got === hitsReference(edges, 3), s"trial $trial")
      }
    }
  }

  test("HITS is partitioning-invariant") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val a = Hits.ranks(edges.toDF("s", "d").repartition(1), "s", "d")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Hits.ranks(edges.toDF("s", "d").repartition(7), "s", "d")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("k-core peels a pendant chain off a clique") {
    // K4 (vertices 0-3) + chain 3-4-5: one k=3 round peels 4 and 5
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val edges = k4 ++ Seq((3L, 4L), (4L, 5L))
    val got = KCore.peel(edges.toDF("a", "b"), "a", "b", k = 3, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    assert(got.values.forall(_ === 3L))
  }

  test("k-core property: == sequential peel (8 seeded trials)") {
    for (trial <- 0 until 8) {
      val rng = new scala.util.Random(8300 + trial)
      val n = 16
      val edges = (for {
        a <- 0L until n; b <- 0L until n
        if a < b && rng.nextDouble() < 0.3
      } yield (a, b)).toSet
      if (edges.nonEmpty) {
        val got = KCore.peel(edges.toSeq.toDF("a", "b"), "a", "b",
            k = 4, rounds = 3)
          .as[(Long, Long)].collect().toMap
        assert(got === kcoreReference(edges, 4, 3), s"trial $trial")
      }
    }
  }

  test("k-core: graph that peels away entirely returns empty, not error") {
    val got = KCore.peel(Seq((1L, 2L), (2L, 3L)).toDF("a", "b"),
      "a", "b", k = 3, rounds = 2)
    assert(got.count() === 0L)
  }
}
