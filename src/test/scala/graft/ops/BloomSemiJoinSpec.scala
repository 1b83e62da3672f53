package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.BloomFunctions

/** Bloom-pruned semi-join (q80): exactness under any fpp, no false
  * negatives, and genuine pruning.
  */
class BloomSemiJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private def fact = (1 to 5000).map(_ => rnd.nextInt(2000).toLong)
    .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("row_id", "fk")
  private def dim = (1 to 300).map(_ => rnd.nextInt(2000).toLong)
    .distinct.toDF("dk")

  test("result == plain left-semi join, across fpp settings") {
    val f = fact.cache(); val d = dim.cache()
    val base = f.join(d.withColumnRenamed("dk", "fk").distinct(), Seq("fk"), "left_semi")
    for (fpp <- Seq(0.5, 0.05, 0.001)) {
      val got = BloomSemiJoin.semiJoin(f, "fk", d, "dk", 1000L, fpp)
      assert(got.select("row_id").exceptAll(base.select("row_id")).isEmpty &&
        base.select("row_id").exceptAll(got.select("row_id")).isEmpty,
        s"fpp=$fpp diverges from the exact semi-join")
    }
    f.unpersist(); d.unpersist()
  }

  test("no false negatives: every inserted key passes the bloom predicate") {
    val keys = (0L until 5000L).toDF("k")
    val bf = keys.stat.bloomFilter("k", 5000L, 0.01)
    val ser = BloomFunctions.serialize(bf)
    val misses = keys.filter(!BloomFunctions.mightContainLong(ser, col("k")))
    assert(misses.isEmpty)
  }

  test("pruning is real: a tight filter removes most non-matching rows") {
    val d = Seq(1L, 2L, 3L).toDF("dk")
    val bf = d.stat.bloomFilter("dk", 10L, 0.001)
    val ser = BloomFunctions.serialize(bf)
    val survivors = (1L to 10000L).toDF("fk")
      .filter(BloomFunctions.mightContainLong(ser, col("fk"))).count()
    assert(survivors >= 3 && survivors < 200,
      s"expected ~3 survivors at fpp 0.001, got $survivors")
  }

  test("predicate agrees between codegen and interpreted eval") {
    val d = (0L until 100L by 3).toDF("dk")
    val bf = d.stat.bloomFilter("dk", 100L, 0.01)
    val ser = BloomFunctions.serialize(bf)
    val probe = (0L until 100L).toDF("k")
    val compiled = probe.filter(BloomFunctions.mightContainLong(ser, col("k")))
      .as[Long].collect().toSet
    // force the interpreted path: eval the expression row by row
    val e = BloomFunctions.BloomMightContainLong(ser,
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = false))
    val interpreted = (0L until 100L).filter { k =>
      e.eval(org.apache.spark.sql.catalyst.InternalRow(k))
        .asInstanceOf[Boolean]
    }.toSet
    assert(compiled === interpreted)
  }

  test("empty dim side: no crash, empty exact result (bloom build degrades to plain semi-join)") {
    val fact = (0L until 50L).toDF("k")
    val dim = Seq.empty[Long].toDF("dk")
    val out = graft.ops.BloomSemiJoin.semiJoin(fact, "k", dim, "dk",
      expectedItems = 100L, fpp = 0.01)
    assert(out.count() === 0L)
  }
}
