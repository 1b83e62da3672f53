package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SemDeDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Orthogonal base vectors per "topic"; near-dups are tiny perturbations.
  private def vec(axis: Int, eps: Float = 0f): Seq[Float] = {
    val v = Array.fill(4)(eps)
    v(axis) = 1f
    v.toSeq
  }

  test("within-cell near-dup dropped (lowest id survives); identical vector in ANOTHER cell is kept") {
    val rows = Seq(
      (1L, vec(0), 0),          // survives (lowest of the near-dup pair)
      (5L, vec(0, 0.01f), 0),   // dropped: near-dup of 1 in cell 0
      (7L, vec(1), 0),          // kept: different direction, same cell
      (9L, vec(0), 1)           // kept: identical to 1 but DIFFERENT cell
    ).toDF("vec_id", "embedding", "label")
    val kept = SemDeDup.prune(rows, "vec_id", "embedding", "label", 0.95)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept === Set(1L, 7L, 9L))
  }

  test("chain drop rule: any lower-id qualifying neighbor drops, deterministically") {
    // 1 ~ 5 and 5 ~ 9 (but 1 !~ 9): both 5 and 9 have a lower qualifying
    // neighbor -> both dropped; the rule never depends on whether the
    // neighbor itself survived (execution-order independence).
    val a = vec(0)
    val b = Seq(0.8f, 0.6f, 0f, 0f)   // cos(a,b)=0.8
    val c = Seq(0.3f, 0.954f, 0f, 0f) // cos(b,c)~0.81, cos(a,c)=0.3
    val rows = Seq((1L, a, 0), (5L, b, 0), (9L, c, 0))
      .toDF("vec_id", "embedding", "label")
    val kept = SemDeDup.prune(rows, "vec_id", "embedding", "label", 0.75)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("tiled cell-scoped pairing == per-cell brute force on random data, for several block counts") {
    val rng = new scala.util.Random(23)
    val rows = (0 until 80).map { i =>
      (i.toLong, Seq.fill(6)(rng.nextFloat() * 2 - 1), i % 4)
    }.toDF("vec_id", "embedding", "label")
    def kept(blocks: Int): Set[Long] =
      SemDeDup.prune(rows, "vec_id", "embedding", "label", 0.5, blocks)
        .select($"vec_id").as[Long].collect().toSet
    // brute reference: all same-cell pairs via collect
    val data = rows.select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val d = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      val n = math.sqrt(x.map(p => p.toDouble * p).sum) *
        math.sqrt(y.map(q => q.toDouble * q).sum)
      java.math.BigDecimal.valueOf(d / n)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val dropped = (for {
      a <- data; b <- data
      if a._3 == b._3 && b._1 < a._1 && cos(a._2, b._2) >= 0.5
    } yield a._1).toSet
    val want = data.map(_._1).toSet -- dropped
    assert(dropped.nonEmpty, "fixture should produce at least one drop")
    Seq(1, 2, 5).foreach(nb => assert(kept(nb) === want, s"blocks=$nb"))
  }
}
