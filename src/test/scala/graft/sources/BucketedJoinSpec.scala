package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bucketing = the co-located-join layout for repeated fact-fact joins: both
  * tables pre-hashed into the same bucket count on the join key means the
  * sort-merge join reads bucket i against bucket i with NO exchange — at
  * 100 TB that's the difference between a network-bound and an IO-bound job.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join of two tables bucketed on the key plans without a shuffle") {
    // small test tables would auto-broadcast; force the fact-fact shape
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val l = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    // clear any leftover managed-table locations from interrupted runs
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b").join(spark.table("orders_b"),
      spark.table("lineitem_b")("l_orderkey") === spark.table("orders_b")("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n${plan.take(1500)}")
    assert(joined.count() === l.count())

    spark.sql("DROP TABLE lineitem_b")
    spark.sql("DROP TABLE orders_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
