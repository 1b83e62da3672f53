package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** CDC snapshot diff (q79): key classification and payload canonicalization. */
class SnapshotDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("classifies added / removed / changed / unchanged") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val nu = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val got = SnapshotDiff.diff(old, nu, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added")))
  }

  test("payload column ORDER does not matter (canonical fingerprint)") {
    val old = Seq((1L, "a", 10.0)).toDF("k", "s", "v")
    val nu = Seq((1L, 10.0, "a")).toDF("k", "v", "s").select("k", "v", "s")
    val got = SnapshotDiff.diff(old, nu, Seq("k"))
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "unchanged")))
  }

  test("null payload values fingerprint stably") {
    val old = Seq((1L, Option.empty[Double]), (2L, Some(1.0)))
      .toDF("k", "v")
    val nu = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("k", "v")
    val got = SnapshotDiff.diff(old, nu, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "unchanged"), (2L, "changed")))
  }

  test("mismatched payload schemas are rejected loudly") {
    val old = Seq((1L, "a")).toDF("k", "s")
    val nu = Seq((1L, 2.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, nu, Seq("k"))
    }
    assert(e.getMessage.contains("payload columns differ"))
  }

  test("composite keys") {
    val old = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k1", "k2", "p")
    val nu = Seq((1L, 1L, "x"), (2L, 1L, "z")).toDF("k1", "k2", "p")
    val got = SnapshotDiff.diff(old, nu, Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, "unchanged"), (1L, 2L, "removed"), (2L, 1L, "added")))
  }
}
