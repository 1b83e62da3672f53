package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface sanity: every declared query runs and returns rows at the
  * smoke scale, the HLL estimate is tight, and order-sensitive operators are
  * run-to-run deterministic (the property the oracle hash-compare relies on).
  */
class QuerySanitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every query executes and returns rows at sf0.001") {
    Queries.all.foreach { q =>
      val rows = q.fn(spark, dir).collect()
      assert(rows.nonEmpty, s"${q.name} returned no rows")
    }
  }

  test("every query's output schema uses only hash-stable types") {
    // Mirror of the DuckDB-side type gate in tools/oracle_check.py: the
    // driver's hash compare reads typed values, so an output column outside
    // this set (DecimalType from an unparenthesized sum-product, structs,
    // arrays, FloatType) would hash-differ even when values match. Decimal
    // math belongs INSIDE a query; outputs must land on these types.
    import org.apache.spark.sql.types._
    val ok: Set[DataType] = Set(StringType, LongType, IntegerType, DoubleType,
      BooleanType, DateType, TimestampType)
    Queries.all.foreach { q =>
      val bad = q.fn(spark, dir).schema.fields.filterNot(f => ok(f.dataType))
      assert(bad.isEmpty,
        s"${q.name}: non-hash-stable output col(s) " +
          bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    }
  }

  test("approx_count_distinct within tolerance of exact (q26)") {
    // q26 outputs (l_returnflag, exact_parts, approx_ok): the HLL estimate
    // itself is engine-specific, so the checkable surface is the boolean.
    val rows = Queries.byName("q26_approx_distinct").fn(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"flag ${r.getString(0)}: no exact count")
      assert(r.getBoolean(2), s"flag ${r.getString(0)}: estimate out of band")
    }
  }

  test("order-sensitive queries are run-to-run deterministic") {
    Seq("q08_dedup_keeplast", "q33_minhash_lsh", "q35_knn_cosine", "q15_asof_join")
      .foreach { name =>
        val a = Queries.byName(name).fn(spark, dir).collect().toSeq
        val b = Queries.byName(name).fn(spark, dir).collect().toSeq
        assert(a === b, name)
      }
  }
}
