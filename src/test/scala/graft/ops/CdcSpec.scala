package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Columnar CDC apply (q118): tombstone resets, partial updates,
  * I-null column resets, algebraic (partition-order-independent) collapse.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snap(rows: Seq[(Long, Long, String, Option[Long], Option[String])]) =
    Cdc.applyLog(rows.toDF("k", "seq", "op", "v", "p"),
      Seq("k"), col("seq"), col("op"), Seq("v", "p"))
      .orderBy("k")
      .as[(Long, Option[Long], Option[String])].collect().toSeq

  test("partial updates resolve per column; tombstone kills the key") {
    val got = snap(Seq(
      // k=1: I(v=1,p=a), U(v=2), U(p=b) -> (2, b)
      (1L, 1L, "I", Some(1L), Some("a")),
      (1L, 2L, "U", Some(2L), None),
      (1L, 3L, "U", None, Some("b")),
      // k=2: ends in D -> absent
      (2L, 1L, "I", Some(9L), Some("x")),
      (2L, 2L, "D", None, None),
      // k=3: D then re-upserted partially -> (7, null): pre-D write lost
      (3L, 1L, "I", Some(5L), Some("old")),
      (3L, 2L, "D", None, None),
      (3L, 3L, "U", Some(7L), None)))
    assert(got === Seq(
      (1L, Some(2L), Some("b")),
      (3L, Some(7L), None)))
  }

  test("I rewrites every column — its nulls RESET; U nulls do not") {
    val got = snap(Seq(
      (1L, 1L, "I", Some(1L), Some("a")),
      (1L, 2L, "I", Some(2L), None), // re-init resets p to null
      (2L, 1L, "I", Some(1L), Some("a")),
      (2L, 2L, "U", None, None))) // no-op update touches nothing
    assert(got === Seq((1L, Some(2L), None), (2L, Some(1L), Some("a"))))
  }

  test("U-only key is alive (upsert semantics); D-only key is absent") {
    val got = snap(Seq(
      (1L, 5L, "U", None, Some("only-p")),
      (2L, 1L, "D", None, None)))
    assert(got === Seq((1L, None, Some("only-p"))))
  }

  test("collapse is partition-order-independent (algebraic partials)") {
    val log = (1L to 400L).map { s =>
      val op = if (s % 97 == 0) "D" else if (s % 5 == 0) "I" else "U"
      (s % 7, s, op,
        if (s % 3 == 0) Some(s) else None,
        if (s % 4 == 0) Some(s"p$s") else None)
    }
    val a = snap(scala.util.Random.shuffle(log))
    val b = Cdc.applyLog(log.toDF("k", "seq", "op", "v", "p").repartition(13),
      Seq("k"), col("seq"), col("op"), Seq("v", "p"))
      .orderBy("k").as[(Long, Option[Long], Option[String])].collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("composite struct seq orders ties deterministically") {
    val df = Seq(
      (1L, 10L, 0L, "I", Some(1L)),
      (1L, 10L, 1L, "U", Some(2L)), // same ts, higher tiebreak wins
      (1L, 9L, 9L, "U", Some(99L))).toDF("k", "ts", "tie", "op", "v")
    val got = Cdc.applyLog(df, Seq("k"), struct(col("ts"), col("tie")),
      col("op"), Seq("v"))
      .as[(Long, Option[Long])].collect().toSeq
    assert(got === Seq((1L, Some(2L))))
  }
}
