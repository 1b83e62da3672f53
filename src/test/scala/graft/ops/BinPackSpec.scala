package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** BinPack: the distributed prefix-packing must equal the sequential
  * next-fit-decreasing replay exactly, keep bins contiguous, bound the
  * overflow by one straddling item, and be stable under repartitioning.
  */
class BinPackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, (1 + rnd.nextInt(500)).toLong))
  }

  private def sequential(items: Seq[(Long, Long)], target: Long)
      : Map[Long, Long] = {
    var cum = 0L
    items.sortBy { case (id, sz) => (-sz, id) }.map { case (id, sz) =>
      val bin = cum / target
      cum += sz
      id -> bin
    }.toMap
  }

  test("distributed assignment == sequential NFD replay") {
    val items = fixture(71, 500)
    val target = 2000L
    val got = BinPack.assignBins(items.toDF("id", "sz"),
        Seq.empty, "id", "sz", target)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bin")).toMap
    assert(got === sequential(items, target))
  }

  test("bins contiguous from 0; mid-sequence overflow < target + one item") {
    val items = fixture(73, 400)
    val target = 1500L
    val fills = BinPack.assignBins(items.toDF("id", "sz"),
        Seq.empty, "id", "sz", target)
      .groupBy($"bin").agg(sum($"sz").as("fill"), max($"sz").as("mx"))
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("fill"),
        r.getAs[Long]("mx")))
    val bins = fills.map(_._1).sorted
    assert(bins === (0L until bins.length.toLong).toArray)
    fills.foreach { case (b, fill, mx) =>
      assert(fill < target + mx, s"bin $b overflows past one item")
    }
    // every bin except the last covers its full target slice
    val last = bins.max
    fills.filter(_._1 != last).foreach { case (b, fill, mx) =>
      assert(fill + mx > target, s"bin $b underfilled")
    }
  }

  test("per-group packing is independent; stable under repartition") {
    val items = fixture(79, 300)
      .map { case (id, sz) => (s"g${id % 3}", id, sz) }
    val df = items.toDF("g", "id", "sz")
    val a = BinPack.assignBins(df, Seq("g"), "id", "sz", 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val b = BinPack.assignBins(df.repartition(13), Seq("g"), "id", "sz", 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(a === b)
    // group g0's assignment equals packing g0 alone
    val solo = BinPack.assignBins(df.filter($"g" === "g0"),
        Seq("g"), "id", "sz", 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(a.filter(_._1 == "g0") === solo)
  }
}
