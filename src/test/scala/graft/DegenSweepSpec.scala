package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI form of the degenerate-input sweep (VERDICT r6 next-round #6):
  * every declared query builder runs against the pathological fixture
  * and against zero-row tables, so the advisor-class latent crashes
  * (q76 negative slice length, q100 descending `sequence` on empty
  * arrays) can never regress silently. ~3 min total on the tiny
  * fixtures — the price of sweeping all builders end-to-end.
  */
class DegenSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pathological corpus: no query builder throws") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_degen_ci").toString
    DegenFixtures.writePathological(spark, dir)
    val failures = DegenFixtures.sweep(spark, dir)
    assert(failures.isEmpty,
      failures.map { case (n, m) => s"$n: $m" }.mkString("\n  ", "\n  ", ""))
  }

  test("zero-row tables: only the declared seeded queries fail, loudly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_degen_ci_empty").toString
    DegenFixtures.writeEmpty(spark, dir)
    val failures = DegenFixtures.sweep(spark, dir)
    val names = failures.map(_._1).toSet
    // set EQUALITY both ways: an unexpected crash fails, and a seeded
    // query that stops failing means the allowlist is stale.
    assert(names === DegenFixtures.expectedEmptySeedFailures,
      s"unexpected: ${names -- DegenFixtures.expectedEmptySeedFailures}; " +
        s"stale allowlist: ${DegenFixtures.expectedEmptySeedFailures -- names}\n" +
        failures.map { case (n, m) => s"$n: $m" }.mkString("\n  "))
    // loud-by-design = a require() or a head-of-empty seed lookup — never
    // an arithmetic/cast/codegen error, which would indicate a wrong-path
    // failure mode hiding behind the allowlist.
    val loud = Set("IllegalArgumentException", "NoSuchElementException")
    failures.foreach { case (n, m) =>
      assert(loud.exists(m.startsWith), s"$n failed un-loudly: $m")
    }
  }
}
