package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Fixed-point PageRank (q116): ≡ an in-memory replay of the integer
  * recurrence on random directed graphs (dangling vertices included);
  * bit-identical across repartitionings — the associativity claim the
  * fixed-point design exists for.
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The operator's recurrence, replayed sequentially on the driver. */
  private def reference(edges: Set[(Long, Long)], iterations: Int,
                        scale: Long = 1000000000000L): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2)
    val verts = e.flatMap(p => Seq(p._1, p._2))
    val n = verts.size.toLong
    val p0 = scale / n
    val base = (3L * p0) / 20L
    val outDeg = e.groupBy(_._1).map { case (s, l) => s -> l.size.toLong }
    var pr: Map[Long, Long] = verts.map(_ -> p0).toMap
    for (_ <- 0 until iterations) {
      val dang = pr.collect {
        case (v, p) if !outDeg.contains(v) => p
      }.sum / n
      val cin = e.toSeq.map { case (s, d) => d -> pr(s) / outDeg(s) }
        .groupBy(_._1).map { case (d, l) => d -> l.map(_._2).sum }
      pr = verts.map(v => v -> (base + (17L * (cin.getOrElse(v, 0L) + dang)) / 20L)).toMap
    }
    pr
  }

  test("two-node cycle: symmetric ranks, mass ~= scale") {
    val got = PageRank.ranks(Seq((1L, 2L), (2L, 1L)).toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === got(2L))
    assert(math.abs(got.values.sum - 1000000000000L) < 100,
      s"mass drifted: ${got.values.sum}")
  }

  test("dangling sink outranks its feeders and donates mass back") {
    // star into a sink: 1,2,3 -> 0; 0 has no out-edges
    val got = PageRank.ranks(
        Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(got(0L) > got(1L))
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got === reference(Set((1L, 0L), (2L, 0L), (3L, 0L)), 4))
  }

  test("property: == sequential integer recurrence on random digraphs (8 seeded trials)") {
    for (trial <- 0 until 8) {
      val rng = new scala.util.Random(5100 + trial)
      val n = 14
      val edges = (for {
        a <- 0L until n; b <- 0L until n
        if a != b && rng.nextDouble() < 0.15
      } yield (a, b)).toSet
      if (edges.nonEmpty) {
        // duplicate + self-loop pollution must be cleaned by the op
        val dirty = edges.toSeq ++ edges.take(3) ++ Seq((1L, 1L))
        val got = PageRank.ranks(dirty.toDF("s", "d"), "s", "d",
            iterations = 3)
          .as[(Long, Long)].collect().toMap
        assert(got === reference(edges, 3), s"trial $trial")
      }
    }
  }

  /** Sequential replay of the WEIGHTED recurrence (1e9-scale shares). */
  private def referenceW(edges: Map[(Long, Long), Long], iterations: Int,
                         scale: Long = 1000000000L): Map[Long, Long] = {
    val e = edges.filter { case ((s, d), w) => s != d && w > 0 }
    val outW = e.toSeq.groupBy(_._1._1)
      .map { case (s, l) => s -> l.map(_._2).sum }
    val sh = e.map { case ((s, d), w) =>
      (s, d) -> (BigInt(w) * 1000000000L / outW(s)).toLong }
    val verts = e.keySet.flatMap(p => Seq(p._1, p._2))
    val n = verts.size.toLong
    val p0 = scale / n
    val base = (3L * p0) / 20L
    var pr: Map[Long, Long] = verts.map(_ -> p0).toMap
    for (_ <- 0 until iterations) {
      val dang = pr.collect {
        case (v, p) if !outW.contains(v) => p
      }.sum / n
      val cin = sh.toSeq.map { case ((s, d), shr) =>
          d -> (pr(s) * shr) / 1000000000L }
        .groupBy(_._1).map { case (d, l) => d -> l.map(_._2).sum }
      pr = verts.map(v =>
        v -> (base + (17L * (cin.getOrElse(v, 0L) + dang)) / 20L)).toMap
    }
    pr
  }

  test("weighted: heavier edge pulls more rank; == sequential replay") {
    // 1 -> 2 (w 9) and 1 -> 3 (w 1); 2,3 -> 1 closes the loop
    val edges = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
    val got = PageRank.ranksWeighted(edges.toDF("s", "d", "w"), "s", "d", "w")
      .as[(Long, Long)].collect().toMap
    assert(got(2L) > got(3L))
    assert(got === referenceW(
      edges.map { case (s, d, w) => (s, d) -> w }.toMap, 4))
  }

  test("weighted: int64-extreme weights survive share normalization") {
    // w·shareScale = ~4.6e27 — far past int64; the DECIMAL(38,0) one-off
    // must still produce exact shares (BigInt replay is the witness).
    val big = Long.MaxValue / 2
    val edges = Seq((1L, 2L, big), (1L, 3L, big / 3), (2L, 1L, 1L),
      (3L, 1L, big))
    val got = PageRank.ranksWeighted(edges.toDF("s", "d", "w"), "s", "d", "w")
      .as[(Long, Long)].collect().toMap
    assert(got === referenceW(
      edges.map { case (s, d, w) => (s, d) -> w }.toMap, 4))
    assert(got(2L) > got(3L))
  }

  test("weighted property: == sequential replay on random weighted digraphs") {
    for (trial <- 0 until 6) {
      val rng = new scala.util.Random(7200 + trial)
      val n = 12
      val edges = (for {
        a <- 0L until n; b <- 0L until n
        if a != b && rng.nextDouble() < 0.2
      } yield (a, b) -> (1L + rng.nextInt(1000000).toLong)).toMap
      if (edges.nonEmpty) {
        // parallel-edge pollution: split one edge's weight in two rows
        val rows = edges.toSeq.flatMap { case ((s, d), w) =>
          if (w > 1 && s == 0L) Seq((s, d, w - 1), (s, d, 1L))
          else Seq((s, d, w))
        }
        val got = PageRank.ranksWeighted(rows.toDF("s", "d", "w"),
            "s", "d", "w", iterations = 3)
          .as[(Long, Long)].collect().toMap
        assert(got === referenceW(edges, 3), s"trial $trial")
      }
    }
  }

  test("bit-identical across repartitionings") {
    val rng = new scala.util.Random(42)
    val edges = (for {
      a <- 0L until 30L; b <- 0L until 30L
      if a != b && rng.nextDouble() < 0.1
    } yield (a, b)).toSeq
    val r1 = PageRank.ranks(edges.toDF("s", "d").repartition(1), "s", "d")
      .as[(Long, Long)].collect().toMap
    val r32 = PageRank.ranks(edges.toDF("s", "d").repartition(32), "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(r1 === r32)
  }
}
