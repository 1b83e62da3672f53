package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BoundedTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events = graft.Tables.events(spark, "/root/testdata/sf0.001")

  test("topk agg == window row_number top-N (partial merge path forced)") {
    // 16 partitions force serialize/deserialize + merge of partial heaps
    val viaAgg = events.repartition(16)
      .groupBy($"event_type")
      .agg(BoundedTopK.topkPairs($"value", $"event_id", 5).as("top"))
      .select($"event_type", posexplode($"top"))
      .select($"event_type", ($"pos" + 1).as("rn"),
        $"col.id".as("event_id"), $"col.score".as("value"))
      .as[(String, Int, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"value".desc, $"event_id".asc)
    val viaWindow = events
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"event_type", $"rn", $"event_id", $"value")
      .as[(String, Int, Long, Double)].collect().toSet
    assert(viaAgg === viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("groups smaller than k return all rows, ties break by lower id") {
    val df = Seq(("a", 1.0, 10L), ("a", 1.0, 3L), ("b", 2.0, 7L))
      .toDF("g", "score", "id")
    val out = df.groupBy($"g")
      .agg(BoundedTopK.topkPairs($"score", $"id", 5).as("top"))
      .select($"g", $"top")
      .as[(String, Seq[(Double, Long)])].collect().toMap
    assert(out("a") === Seq((1.0, 3L), (1.0, 10L))) // equal score: lower id first
    assert(out("b") === Seq((2.0, 7L)))
  }

  test("topk_pairs reachable from the SQL surface") {
    graft.GraftExtensions.registerAll(spark)
    events.createOrReplaceTempView("events_topk_v")
    val rows = spark.sql(
      """SELECT event_type, topk_pairs(value, event_id, 2) AS top
        |FROM events_topk_v GROUP BY event_type ORDER BY event_type""".stripMargin)
      .select($"event_type", size($"top").as("n"))
      .as[(String, Int)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 === 2))
  }
}
