package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The session factory must hand users a session with the extension
  * functions installed and the engine's tuning applied — the "switch from
  * the reference" entry point.
  *
  * Test-harness note: one SparkContext per JVM, so the factory session here
  * shares TestSpark's context (getOrCreate semantics) and must NOT be
  * stopped; we clear the default session so the builder genuinely
  * constructs a fresh SparkSession (extensions apply per session), then
  * restore it.
  */
class GraftSessionSpec extends AnyFunSuite {

  test("factory session has extensions + tuning; SQL functions resolve") {
    TestSpark.spark // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = Graft.localSession(cores = 2)
      assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
      assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
      // extension-injected functions resolve without registerAll
      assert(spark.sql("SELECT simhash_fingerprint(array('a','b')) AS f").count() === 1)
      val topk = spark.sql(
        """SELECT topk_pairs(s, i, 2) AS t FROM VALUES
          |(1.0, 1L), (3.0, 2L), (2.0, 3L) AS v(s, i)""".stripMargin)
        .selectExpr("size(t)").head().getInt(0)
      assert(topk === 2)
      // and the registration coerces SQL decimal/int literals (1.0 is
      // DECIMAL(2,1) in SQL) instead of a task-time ClassCastException
      val best = spark.sql(
        """SELECT topk_pairs(s, i, 1)[0].id AS best FROM VALUES
          |(1.5, 7), (0.5, 9) AS v(s, i)""".stripMargin)
        .head().getLong(0)
      assert(best === 7L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
