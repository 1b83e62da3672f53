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
