package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Salted two-stage aggregation: correctness vs the plain aggregate, and
  * the all-hashable-columns salt properties the round-4 advisory asked
  * for — map columns excluded, and a low-cardinality value column under a
  * hot key still spreading across salt buckets.
  */
class SaltedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (1 to 2000).map { i =>
    ("k" + (i % 3), i.toLong % 2, i.toLong, Map("src" -> i))
  }.toDF("key", "flag", "id", "meta")

  test("salted sumCount over a map-carrying frame == plain aggregate") {
    val got = Salted.sumCount(df, Seq("key"), "flag", buckets = 8)
      .orderBy($"key")
      .select($"key", $"sum_flag", $"n")
      .as[(String, Long, Long)].collect().toSeq
    val want = df.groupBy($"key")
      .agg(sum($"flag").as("s"), count(lit(1)).as("n"))
      .orderBy($"key").as[(String, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("hot key with a 0/1 value still spreads across salt buckets (all-column salt)") {
    // replicate the op's salt: every hashable column (meta excluded)
    val salts = df.filter($"key" === "k0" && $"flag" === 0L)
      .select(pmod(hash(col("key"), col("flag"), col("id")), lit(8)).as("s"))
      .distinct().count()
    assert(salts > 4,
      s"constant (key, value) rows must spread via the other columns, got $salts buckets")
    // the regression the advisory flagged: a (keys, value)-only salt
    // collapses these rows into ONE bucket
    val narrow = df.filter($"key" === "k0" && $"flag" === 0L)
      .select(pmod(hash(col("key"), col("flag")), lit(8)).as("s"))
      .distinct().count()
    assert(narrow === 1L)
  }

  test("saltedJoin == plain inner join, and the hot key spreads") {
    // 90% of fact rows hit one key — the straggler shape
    val fact = (1 to 3000).map { i =>
      (if (i % 10 == 0) i.toLong % 50 else 7L, i.toLong, i * 1.5)
    }.toDF("fk", "row_id", "v")
    val dim = (0L until 50L).map(k => (k, s"dim_$k")).toDF("fk", "label")

    val got = Salted.saltedJoin(fact, dim, "fk", buckets = 8)
      .select("row_id", "label")
    val want = fact.join(dim, "fk").select("row_id", "label")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // the hot key's fact rows occupy many salt buckets pre-join
    val hashable = fact.schema.fields.map(f => col(f.name))
    val spread = fact.filter($"fk" === 7L)
      .select(pmod(hash(hashable: _*), lit(8)).as("b"))
      .distinct().count()
    assert(spread >= 7, s"hot key occupies only $spread of 8 buckets")
  }

  test("containsMap detects maps at any nesting depth") {
    import org.apache.spark.sql.types._
    assert(Salted.containsMap(MapType(StringType, IntegerType)))
    assert(Salted.containsMap(ArrayType(MapType(StringType, IntegerType))))
    assert(Salted.containsMap(StructType(Seq(
      StructField("x", ArrayType(StructType(Seq(
        StructField("m", MapType(StringType, LongType))))))))))
    assert(!Salted.containsMap(ArrayType(StructType(Seq(
      StructField("y", DoubleType))))))
  }
}
