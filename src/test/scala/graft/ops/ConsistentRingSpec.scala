package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The 256-bucket equi-join routing table must route every key to the same
  * shard as the naive clockwise-successor scan over the raw ring — that is
  * the whole contract that lets q213/q328 replace a range join (banned
  * BroadcastNestedLoopJoin) with a broadcast equi-join + min-by.
  */
class ConsistentRingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed routing lookup == naive clockwise successor, incl. wrap") {
    val ring = ConsistentRing.ringPoints(spark, 8)
    val routing = ConsistentRing.routingTable(spark, 8)
    def naive(kh: Long): Long =
      ring.filter(_._2 > kh).sortBy(_._2).headOption
        .getOrElse(ring.minBy(_._2))._1
    def viaTable(kh: Long): Long =
      routing.filter(r => r._1 == (kh >> 52) && r._2 > kh).minBy(_._2)._3
    val rng = new scala.util.Random(7)
    val keys = Seq.fill(2000)(rng.nextLong() & 0x0FFFFFFFFFFFFFFFL) ++
      ring.map(_._2) ++ ring.map(_._2 - 1) ++     // on-point and just-below
      Seq(0L, (1L << 60) - 1)                     // ring edges (forced wrap)
    keys.foreach(kh => assert(viaTable(kh) === naive(kh), s"kh=$kh"))
  }

  test("every bucket carries a successor row (no key can strand)") {
    val routing = ConsistentRing.routingTable(spark, 9)
    (0 until 256).foreach { b =>
      val khMax = (b + 1) * ConsistentRing.BucketWidth - 1
      assert(routing.exists(r => r._1 == b && r._2 > khMax), s"bucket $b")
    }
  }
}
