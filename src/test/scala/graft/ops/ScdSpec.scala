package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SCD Type-2 build (q110): interval chaining, change compression,
  * null-safe attribute comparison.
  */
class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("intervals chain per key; unchanged re-deliveries are compressed") {
    val log = Seq(
      (1L, 10L, "gold"), (1L, 20L, "gold"), // re-delivered, no change
      (1L, 30L, "silver"), (1L, 40L, "gold"), // back-and-forth = 2 changes
      (2L, 15L, "basic")).toDF("k", "ts", "tier")
    val got = Scd.buildType2(log, Seq("k"), "ts", Seq("tier"))
      .select("k", "tier", "valid_from", "valid_to", "is_current")
      .orderBy("k", "valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, "gold", 10L, Some(30L), false),
      (1L, "silver", 30L, Some(40L), false),
      (1L, "gold", 40L, None, true),
      (2L, "basic", 15L, None, true)))
  }

  test("null attribute is a stable state, not a perpetual change") {
    val log = Seq((1L, 10L, Some("a")), (1L, 20L, None: Option[String]),
      (1L, 30L, None: Option[String])).toDF("k", "ts", "tier")
    val got = Scd.buildType2(log, Seq("k"), "ts", Seq("tier"))
      .select("k", "tier", "valid_from", "is_current")
      .orderBy("valid_from")
      .as[(Long, Option[String], Long, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, Some("a"), 10L, false), (1L, None, 20L, true)))
  }

  test("multi-column keys and attrs") {
    val log = Seq(
      (1L, "eu", 10L, "a", 1.0), (1L, "eu", 20L, "a", 2.0),
      (1L, "us", 15L, "a", 1.0)).toDF("k", "region", "ts", "s", "v")
    val got = Scd.buildType2(log, Seq("k", "region"), "ts", Seq("s", "v"))
      .select("k", "region", "valid_from", "is_current")
      .orderBy("region", "valid_from")
      .as[(Long, String, Long, Boolean)].collect().toSeq
    // (1, eu): v changed at 20 → two intervals; (1, us): one
    assert(got === Seq(
      (1L, "eu", 10L, false), (1L, "eu", 20L, true), (1L, "us", 15L, true)))
  }
}
