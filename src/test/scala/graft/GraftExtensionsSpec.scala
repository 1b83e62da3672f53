package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{HashExpressions, TextFunctions => TF}

/** The SQL surface must reach the compiled expressions and agree with the
  * Column API.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("registered SQL functions agree with the Column API") {
    GraftExtensions.registerAll(spark)
    Seq((1L, "the quick brown fox jumps again", Seq(0.5f, -0.25f, 1.0f)),
        (2L, "a completely different doc here", Seq(-1.0f, 0.5f, 0.25f)))
      .toDF("id", "text", "vec").createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT id,
        |  simhash_fingerprint(split(text, ' ')) AS sh,
        |  minhash_signature(split(text, ' '), 4) AS mh,
        |  cosine_sim(vec, vec) AS cs,
        |  srp_signature(vec, 16) AS srp
        |FROM ext_docs ORDER BY id""".stripMargin).collect()

    val viaApi = spark.table("ext_docs")
      .select($"id",
        HashExpressions.simhashFingerprint(split($"text", " ")).as("sh"),
        graft.ops.MinHashLSH.signature(split($"text", " "), 4).as("mh"),
        HashExpressions.cosineSim($"vec", $"vec").as("cs"),
        HashExpressions.srpSignature($"vec", 16).as("srp"))
      .orderBy($"id").collect()

    viaSql.zip(viaApi).foreach { case (a, b) =>
      assert(a.getLong(1) === b.getLong(1))           // simhash
      assert(a.getSeq[Long](2) === b.getSeq[Long](2)) // minhash
      assert(math.abs(a.getDouble(3) - 1.0) < 1e-12)  // self-cosine
      assert(a.getLong(4) === b.getLong(4))           // srp
    }
  }

  test("argmax_minkey reachable from SQL and agrees with the Column API") {
    GraftExtensions.registerAll(spark)
    Seq(("g1", 3L, "beta"), ("g1", 3L, "alpha"), ("g1", 1L, "aa"),
        ("g2", 5L, "only"))
      .toDF("g", "c", "k").createOrReplaceTempView("ext_argmax")
    val viaSql = spark.sql(
      """SELECT g, argmax_minkey(c, k) AS k FROM ext_argmax
        |GROUP BY g ORDER BY g""".stripMargin)
      .as[(String, String)].collect().toSeq
    val viaApi = spark.table("ext_argmax").groupBy($"g")
      .agg(graft.functions.ArgExtremum.maxScoreMinKey($"c", $"k").as("k"))
      .orderBy($"g").as[(String, String)].collect().toSeq
    assert(viaSql === Seq("g1" -> "alpha", "g2" -> "only"))
    assert(viaSql === viaApi)
  }
}
