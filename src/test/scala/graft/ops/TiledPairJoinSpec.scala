package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property coverage for the block-tiled exact pair join: every unordered
  * pair must be examined EXACTLY once regardless of block count — the
  * diagonal tiles carry both orientations (id filter keeps one) while
  * off-diagonal tiles carry exactly one (normalized by least/greatest).
  */
class TiledPairJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tiled pair join == brute force for every block count") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 60).map { i =>
      (i.toLong, Seq.fill(8)(rng.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    // threshold -1: EVERY pair qualifies -> output size must be C(60,2)
    // and each pair appear exactly once (duplicates would break the count)
    val expected = 60 * 59 / 2
    Seq(1, 2, 3, 5, 8).foreach { nb =>
      val out = Knn.nearDuplicatePairs(rows, "vec_id", "embedding",
          threshold = -1.0, blocks = nb)
        .select("vec_a", "vec_b").as[(Long, Long)].collect()
      assert(out.length === expected, s"blocks=$nb")
      assert(out.toSet.size === expected, s"blocks=$nb emitted duplicates")
      assert(out.forall(p => p._1 < p._2), s"blocks=$nb orientation")
    }
  }

  test("tiled pair join matches the quadratic reference at a real threshold") {
    val rng = new scala.util.Random(23)
    val base = (0 until 20).map(_ => Array.fill(8)(rng.nextFloat() * 2 - 1))
    // plant near-dups: each base vector plus a tiny perturbation
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong * 2, v.toSeq),
        (i.toLong * 2 + 1, v.map(x => x + rng.nextFloat() * 0.01f).toSeq))
    }.toDF("vec_id", "embedding")
    val brute = rows.as("a").join(rows.as("b"),
        $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        org.apache.spark.sql.functions.round(
          graft.functions.HashExpressions.cosineSim($"a.embedding", $"b.embedding"),
          6).as("cos"))
      .filter($"cos" >= 0.999)
      .as[(Long, Long, Double)].collect().toSet
    val tiled = Knn.nearDuplicatePairs(rows, "vec_id", "embedding",
        threshold = 0.999, blocks = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(tiled === brute)
    assert(brute.size >= 20) // the planted pairs are all found
  }
}
