package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.{TextFunctions => TF}

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rolling fingerprint is order-sensitive where set fingerprints are blind") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),   // same token SET, different order
      (3L, "alpha beta gamma")    // exact duplicate of 1
    ).toDF("doc_id", "text")
    val fps = docs
      .select($"doc_id", TF.rollingFingerprint(TF.tokens($"text")).as("fp"))
      .orderBy("doc_id").as[(Long, Long)].collect().map(_._2)
    assert(fps(0) === fps(2), "identical sequences must agree")
    assert(fps(0) !== fps(1), "reordered sequence must differ")
    // permutation-blind comparison: the sorted-set md5 (q36's key) collides
    val setFps = docs.select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.array_join(
          org.apache.spark.sql.functions.array_sort(
            org.apache.spark.sql.functions.array_distinct(TF.tokens($"text"))), " ")))
      .as[String].collect()
    assert(setFps.toSet.size === 1)
  }

  test("rolling fingerprint of empty text is 0 (the documented empty fold)") {
    val fp = Seq((1L, "")).toDF("doc_id", "text")
      .select(TF.rollingFingerprint(TF.tokens($"text"))).as[Long].head()
    assert(fp === 0L)
  }

  test("bpe tokens split letter/digit/punctuation runs") {
    val out = Seq((1L, "ab3 c-d 42")).toDF("doc_id", "text")
      .select(TF.bpeTokens($"text")).as[Seq[String]].head()
    assert(out === Seq("ab", "3", "c", "-", "d", "42"))
  }
}
