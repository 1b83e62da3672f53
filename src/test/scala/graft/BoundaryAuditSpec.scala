package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextFunctions => TF}

/** Rounding-boundary audit for the transcendental queries.
  *
  * q77/q96 (BM25 ln-idf), q97 (ln + exp), q141 (ln in PSI) and q148
  * (ln in entropy) emit `round(f(ln|exp ...), p)` outputs. `ln`/`exp` are
  * NOT required to be correctly rounded by IEEE-754, so different libm
  * builds (JVM vs the driver's DuckDB) can disagree in the last ulp
  * (~1e-16 relative). If a pre-round value sits essentially ON a rounding
  * boundary (k + 0.5)·10^-p, that ulp flips the rounded output and the
  * driver's hash compare flakes — exactly what hit q142 in round 6 before
  * it was restructured to IEEE-only arithmetic.
  *
  * The remaining five queries cannot drop the transcendental (the ln IS
  * the semantics: idf, log-prob, p·ln(p/q)). This suite is the agreed
  * alternative (VERDICT r6 next-round #2): recompute every value that
  * feeds a risky round site WITHOUT the final rounding, and assert its
  * distance to the nearest boundary is well above libm drift. The values
  * involved have magnitude ≤ ~30, so a few-ulp libm disagreement moves
  * them by ≤ ~4e-15; we assert clearance > 1e-12, i.e. a flake needs the
  * two libms to disagree by ~250+ ulps. (VERDICT suggested ~1e-9, but the
  * sf0.1 data measures below that — see the table — so 1e-9 would assert
  * a falsehood; 1e-12 is the measured-safe line.)
  *
  * Measured min clearances at sf0.001 / sf0.01 / sf0.1 (2026-08-14, this
  * commit; boundary spacing 1e-6, max possible clearance 5e-7):
  *   q77/q96 bm25 c:    9.0e-10 / 4.3e-10 / 1.6e-11
  *   q77/q96 bm25 sum:  5.0e-7  / 5.0e-7  / 5.0e-7  (maximal: sums of
  *     6dp-rounded values sit on exact multiples of 1e-6, so this site
  *     is structurally immune)
  *   q97 avg_nll:       7.5e-10 / 5.1e-10 / 7.7e-11
  *   q97 ppl (p=4):     1.4e-7  / 2.0e-7  / 4.5e-9
  *   q141 psi:          5.2e-8  / 3.1e-9  / 5.8e-8
  *   q148 entropy:      1.5e-8  / 5.8e-9  / 3.2e-8
  * The tightest surface-wide is bm25-c at sf0.1: 1.6e-11, still ~4000×
  * the worst-case libm drift. If a driver flake ever does hit q77/q96,
  * its signature is pre-explained: one per-term contribution flipping by
  * exactly 1e-6, so one doc score off by exactly 1e-6 with every other
  * row bit-identical.
  *
  * Default SFs: sf0.001 + sf0.01 (CI-fast). SPARK_GRAFT_AUDIT_SFS
  * overrides (comma-separated dir names under /root/testdata) — the
  * committed numbers above were produced with all three.
  */
class BoundaryAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfs: Seq[String] = sys.env.get("SPARK_GRAFT_AUDIT_SFS")
    .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    .getOrElse(Seq("sf0.001", "sf0.01"))
    .map(n => s"/root/testdata/$n")
    .filter(d => new java.io.File(d).exists)

  /** Distance from x to the nearest round-half boundary (k + 0.5)·10^-p,
    * in value units. Works for negative x: the fractional part of x·10^p
    * under floor() is in [0, 1) for either sign and the boundary sits at
    * 0.5 of it either way.
    */
  private def clearance(x: Double, p: Int): Double = {
    val s = x * math.pow(10, p)
    val f = s - math.floor(s)
    math.abs(f - 0.5) * math.pow(10, -p)
  }

  private def minClearance(values: Seq[Double], p: Int): Double =
    if (values.isEmpty) Double.PositiveInfinity
    else values.iterator.map(clearance(_, p)).min

  // Audit mirrors. These intentionally duplicate the risky tail of each
  // query's arithmetic (minus the final round) — the point is to
  // characterize the VALUES the round sees, so the mirror only has to
  // reproduce the expression shape, which is pinned by the oracle SQL
  // anyway. Shared front-ends (Tables.*, TF.tokens) are the real ones.

  /** q77/q96 BM25: (unrounded per-(doc,term) contribution c,
    * per-doc sum of ROUNDED c pre-final-round). Mirrors ops/Bm25.topK. */
  private def bm25Sites(dir: String): (Seq[Double], Seq[Double]) = {
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", TF.tokens($"text").as("toks"))
    val t = docs.select($"doc_id", $"toks", size($"toks").cast("double").as("dl"))
    val statsRow = t.agg(count(lit(1)).cast("double"), avg($"dl")).head
    val (n, avgdl) = (statsRow.getDouble(0), statsRow.getDouble(1))
    val tf = t.select($"doc_id", $"dl",
        explode(typedlit(Seq("spark", "vector", "customer"))).as("term"),
        $"toks")
      .select($"doc_id", $"term", $"dl",
        size(filter($"toks", x => x === $"term")).cast("double").as("tf"))
      .filter($"tf" > 0)
    val dfc = tf.groupBy($"term").agg(count(lit(1)).cast("double").as("df"))
    val c = tf.join(broadcast(dfc), "term")
      .select($"doc_id",
        (log(lit(1.0) + (lit(n) - $"df" + 0.5) / ($"df" + 0.5)) *
          ($"tf" * 2.2) /
          ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / lit(avgdl))))
          .as("c"))
    val cVals = c.select($"c").as[Double].collect().toSeq
    val sumVals = c.select($"doc_id", round($"c", 6).as("c6"))
      .groupBy($"doc_id").agg(sum($"c6").as("s"))
      .select($"s").as[Double].collect().toSeq
    (cVals, sumVals)
  }

  /** q97: (unrounded avg_nll, unrounded ppl = exp(round(avg_nll, 6))). */
  private def q97Sites(dir: String): (Seq[Double], Seq[Double]) = {
    val t = Tables.documents(spark, dir)
      .select($"doc_id", TF.tokens($"text").as("toks"))
    val toks = t.select($"doc_id", explode($"toks").as("tok"))
    val counts = toks.groupBy($"tok").agg(count(lit(1)).as("c"))
    val Array(bigT, vocabV) = counts
      .agg(sum($"c"), count(lit(1))).head.toSeq.map(_.asInstanceOf[Long]).toArray
    val nll = toks.join(counts, "tok")
      .select($"doc_id",
        log(($"c" + 1.0) / lit((bigT + vocabV).toDouble)).as("lp"))
      .groupBy($"doc_id").agg((-avg($"lp")).as("nll"))
    val nllVals = nll.select($"nll").as[Double].collect().toSeq
    val pplVals = nll.select(exp(round($"nll", 6)).as("ppl"))
      .select($"ppl").as[Double].collect().toSeq
    (nllVals, pplVals)
  }

  /** q141: unrounded psi per event type. */
  private def q141Sites(dir: String): Seq[Double] = {
    val e = Tables.events(spark, dir)
      .select($"event_type",
        expr("ts_us div 86400000000").cast("long").as("day"), $"value")
    val Array(d0, d1) = e.agg(min($"day"), max($"day"))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    val split = d0 + (d1 - d0 + 1) / 2
    val cb = e.select($"event_type", ($"day" < split).as("in_a"),
        least(floor($"value" / 50.0), lit(9.0)).cast("long").as("bin"))
      .groupBy($"event_type", $"bin")
      .agg(sum(when($"in_a", 1L).otherwise(0L)).as("cnt_a"),
        sum(when($"in_a", 0L).otherwise(1L)).as("cnt_b"))
    val tot = cb.groupBy($"event_type")
      .agg(sum($"cnt_a").as("tot_a"), sum($"cnt_b").as("tot_b"))
    cb.join(broadcast(tot), "event_type")
      .filter($"cnt_a" > 0 && $"cnt_b" > 0)
      .select($"event_type",
        ($"cnt_a".cast("double") / $"tot_a").as("p"),
        ($"cnt_b".cast("double") / $"tot_b").as("q"))
      .groupBy($"event_type")
      .agg(sum(($"p" - $"q") * log($"p" / $"q")).as("psi"))
      .select($"psi").as[Double].collect().toSeq
  }

  /** q148: unrounded entropy per day. */
  private def q148Sites(dir: String): Seq[Double] = {
    val c = Tables.events(spark, dir)
      .select(expr("ts_us div 86400000000").cast("long").as("day"),
        $"event_type")
      .groupBy($"day", $"event_type").agg(count(lit(1)).as("c"))
    val tot = c.groupBy($"day").agg(sum($"c").as("tot"))
    c.join(broadcast(tot), "day")
      .select($"day", ($"c".cast("double") / $"tot").as("p"))
      .groupBy($"day")
      .agg((-sum($"p" * log($"p")) + lit(0.0)).as("entropy"))
      .select($"entropy").as[Double].collect().toSeq
  }

  private val MinClear = 1e-12

  test("transcendental oracle set is pinned to exactly the five audited queries") {
    // The q180-q324 families were designed rational-by-construction (integer
    // ppm/µunit arithmetic; Benford/NDCG-style constants pre-computed in
    // Scala and printed into both engines as literals), so the set of
    // queries whose ORACLE SQL executes a transcendental inside the
    // hash-compared plan must stay exactly the five this suite audits. A
    // failure here means a new query snuck a ln/log/exp past the audit —
    // either restructure it to integer arithmetic or add a boundary mirror
    // above and extend this pin. sqrt is NOT in the pattern: IEEE-754
    // requires it correctly rounded, so both engines' libms agree bit-for-
    // bit (q111 relies on exactly this and is exempt by design).
    val pat = "(?i)\\b(ln|log|log2|log10|exp|pow|power)\\s*\\(".r
    val offenders = Queries.all.iterator.flatMap { q =>
      q.oracle.filter(sql => pat.findFirstIn(sql).isDefined).map(_ => q.name)
    }.toSet
    val pinned = Set("q77_bm25", "q96_hybrid_rrf", "q97_lm_perplexity",
      "q141_psi_drift", "q148_entropy")
    assert(offenders === pinned,
      s"unexpected transcendental oracle(s): ${(offenders -- pinned).toSeq.sorted
        .mkString(", ")}; missing: ${(pinned -- offenders).toSeq.sorted.mkString(", ")}")
  }

  for (dir <- sfs) {
    val sf = dir.split("/").last

    test(s"q77/q96 bm25 round sites clear the boundary at $sf") {
      val (c, s) = bm25Sites(dir)
      val (mc, ms) = (minClearance(c, 6), minClearance(s, 6))
      info(f"bm25 c min clearance = $mc%.3g over ${c.size} values")
      info(f"bm25 sum min clearance = $ms%.3g over ${s.size} values")
      assert(mc > MinClear, f"per-term contribution within $mc%.3g of a 6dp boundary")
      assert(ms > MinClear, f"per-doc score within $ms%.3g of a 6dp boundary")
    }

    test(s"q97 avg_nll and ppl round sites clear the boundary at $sf") {
      val (nll, ppl) = q97Sites(dir)
      val (mn, mp) = (minClearance(nll, 6), minClearance(ppl, 4))
      info(f"avg_nll min clearance = $mn%.3g over ${nll.size} values")
      info(f"ppl min clearance = $mp%.3g over ${ppl.size} values")
      assert(mn > MinClear, f"avg_nll within $mn%.3g of a 6dp boundary")
      assert(mp > MinClear, f"ppl within $mp%.3g of a 4dp boundary")
    }

    test(s"q141 psi round site clears the boundary at $sf") {
      val m = minClearance(q141Sites(dir), 6)
      info(f"psi min clearance = $m%.3g")
      assert(m > MinClear, f"psi within $m%.3g of a 6dp boundary")
    }

    test(s"q148 entropy round site clears the boundary at $sf") {
      val m = minClearance(q148Sites(dir), 6)
      info(f"entropy min clearance = $m%.3g")
      assert(m > MinClear, f"entropy within $m%.3g of a 6dp boundary")
    }
  }
}
