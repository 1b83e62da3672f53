package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ops.{MinHashLSH, SimHash}
import graft.functions.{TextFunctions => TF}

/** The compiled hash expressions must be bit-identical to the HOF reference
  * implementations (which in turn mirror the DuckDB oracle SQL).
  */
class HashExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    .limit(100)

  test("MinHashSignature == HOF signatureFromHashes(unitHashes)") {
    val sh = docs.select($"doc_id", TF.shingles($"text", 3).as("sh"))
    val both = sh.select($"doc_id",
      HashExpressions.minhashSignature($"sh", 16,
        MinHashLSH.A.take(16), MinHashLSH.B.take(16)).as("fast"),
      MinHashLSH.signature($"sh", 16).as("ref"))
    assert(both.filter(not($"fast" === $"ref")).isEmpty)
  }

  test("SimHashFingerprint == HOF fingerprint") {
    val t = docs.select($"doc_id", TF.tokens($"text").as("toks"))
    val both = t.select(
      HashExpressions.simhashFingerprint($"toks").as("fast"),
      SimHash.fingerprint($"toks").as("ref"))
    assert(both.filter($"fast" =!= $"ref").isEmpty)
  }

  test("hash60Bytes matches the SQL-visible conv(substring(md5,1,15),16,10)") {
    val vals = Seq("", "a", "spark window batch", "日本語").toDF("s")
    val both = vals.select(
      TF.hash60($"s").as("ref"),
      HashExpressions.minhashSignature(array($"s"), 1,
        Array(1L), Array(0L)).getItem(0).as("viaExpr"))
    // with a=1, b=0: signature[0] = hash60(s) % P
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) % HashExpressions.P)
    }
  }
}
