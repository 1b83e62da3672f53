package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Morton interleave (q87) + the z-clustered write layout. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mask-spread fast path == bit-at-a-time reference, incl. 31-bit masking") {
    val rnd = new scala.util.Random(3)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (0x7fffffffL, 0x7fffffffL), (0xffffffffL, 0x123456789L)) ++
      (1 to 200).map(_ => (rnd.nextLong().abs, rnd.nextLong().abs))
    cases.foreach { case (x, y) =>
      val exp = ZOrderFunctions.interleaveRef(x & 0x7fffffffL, y & 0x7fffffffL)
      val got = ZOrderFunctions.spread31(x) | (ZOrderFunctions.spread31(y) << 1)
      assert(got === exp, s"($x, $y)")
    }
  }

  test("known z-curve values") {
    assert(ZOrderFunctions.interleaveRef(0, 0) === 0L)
    assert(ZOrderFunctions.interleaveRef(1, 0) === 1L)
    assert(ZOrderFunctions.interleaveRef(0, 1) === 2L)
    assert(ZOrderFunctions.interleaveRef(1, 1) === 3L)
    assert(ZOrderFunctions.interleaveRef(2, 0) === 4L)
    assert(ZOrderFunctions.interleaveRef(7, 7) === 63L)
  }

  test("column expression (codegen path) agrees with the reference") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 300).map(_ =>
      (rnd.nextInt(1 << 30).toLong, rnd.nextInt(1 << 30).toLong))
    val got = rows.toDF("x", "y")
      .select($"x", $"y", ZOrderFunctions.zorder($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === ZOrderFunctions.interleaveRef(x, y), s"($x, $y)")
    }
  }

  test("writeClustered bounds BOTH dimension spans per file; x-sort does not") {
    val n = 4096
    val rnd = new scala.util.Random(9)
    // independent uniform dims — the case single-column sort cannot cluster
    val df = (1 to n).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .toDF("x", "y")

    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    graft.sources.PartitionedStore.writeClustered(df, "x", "y", zdir, files = 64)
    def spans(dir: String): (Double, Double) = {
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
        .agg(avg($"sx"), avg($"sy")).as[(Double, Double)].head()
      perFile
    }
    val (zx, zy) = spans(zdir)

    val xdir = java.nio.file.Files.createTempDirectory("xsort").toString
    df.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xdir)
    val (sx, sy) = spans(xdir)

    // z-order: each file covers a small rectangle in BOTH dims
    assert(zx < 0.35 * n, s"z-layout x-span $zx")
    assert(zy < 0.35 * n, s"z-layout y-span $zy")
    // x-sort: tight on x, but y is the full range — no pruning possible
    assert(sx < 0.2 * n, s"x-sort x-span $sx")
    assert(sy > 0.8 * n, s"x-sort y-span $sy")
  }
}
