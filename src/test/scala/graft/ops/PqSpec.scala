package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.TestSpark.spark
  import spark.implicits._

  // Two well-separated unit-norm clusters in 4-dim, two per subspace at
  // m=2: PQ with ksub=2 must reconstruct cluster structure exactly.
  private val a1 = Seq(1.0, 0.0, 1.0, 0.0).map(_ / math.sqrt(2))
  private val a2 = Seq(0.9, 0.1, 0.9, 0.1).map(_ / math.sqrt(0.82 * 2))
  private val b1 = Seq(0.0, 1.0, 0.0, 1.0).map(_ / math.sqrt(2))
  private val b2 = Seq(0.1, 0.9, 0.1, 0.9).map(_ / math.sqrt(0.82 * 2))
  private def emb = Seq(
    (1L, a1), (2L, a2), (3L, b1), (4L, b2)).toDF("id", "v")

  test("train partitions each subspace; encode groups cluster-mates") {
    val cb = Pq.train(emb, "v", m = 2, ksub = 2, iters = 3)
    assert(cb.m === 2 && cb.subDim === 2 && cb.cents.forall(_.length == 2))
    val codes = Pq.encode(emb, "id", "v", cb)
      .as[(Long, Seq[Int])].collect().toMap
    // same-cluster vectors share the full code word; clusters differ
    assert(codes(1L) === codes(2L))
    assert(codes(3L) === codes(4L))
    assert(codes(1L) !== codes(3L))
  }

  test("ADC top-k ranks the query's own cluster first") {
    val cb = Pq.train(emb, "v", m = 2, ksub = 2, iters = 3)
    val enc = Pq.encode(emb, "id", "v", cb)
    val q = Seq((10L, a1)).toDF("qid", "qv")
    val top = Pq.adcTopKJoin(q, "qid", "qv", enc, "id", cb, k = 2)
      .orderBy($"rank").as[(Long, Long, Long, Long)].collect()
    assert(top.map(_._2).toSet === Set(1L, 2L)) // cluster A, not B
    assert(top.map(_._4).toSeq === Seq(1L, 2L))
  }

  test("indivisible dimension fails loud") {
    intercept[IllegalArgumentException] {
      Pq.train(emb, "v", m = 3, ksub = 2, iters = 1)
    }
  }
}
