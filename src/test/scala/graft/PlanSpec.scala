package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the plans we designed for are the plans Spark
  * picks. These are the properties that decide 100 TB behavior — a silent
  * regression to a shuffle join or a full-column scan matters more than a
  * few percent of local runtime.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val qe = Queries.byName(name).fn(spark, dir).queryExecution
    qe.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  test("q04 dimension join is a broadcast hash join (no shuffle of the fact side)") {
    assert(plan("q04_dim_join_agg").contains("BroadcastHashJoin"))
  }

  test("q02 filters are pushed to the parquet scan") {
    val p = plan("q02_filter_project")
    // plan strings truncate the filter list; the leading entries suffice
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity), GreaterThanOrEqual(l_shipdate"))
  }

  test("q02 scan reads only the projected columns") {
    val p = plan("q02_filter_project")
    // ReadSchema must not include untouched wide columns
    assert(!p.contains("l_comment") && !p.contains("l_tax"))
  }

  test("q03 top-k plans TakeOrderedAndProject, not a global sort") {
    assert(plan("q03_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("q01 aggregation runs inside whole-stage codegen") {
    // AQE shows codegen stage ids only in the final (executed) plan
    val df = Queries.byName("q01_pricing_summary").fn(spark, dir)
    df.collect()
    // "*(n)" prefixes mark whole-stage-codegen stages in the final plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), p.take(2000))
  }

  test("q06 semi join and q07 anti join plan as such") {
    assert(plan("q06_semi_join").contains("LeftSemi"))
    assert(plan("q07_anti_join").contains("LeftAnti"))
  }

  test("q40 exact pair join is block-tiled: no nested-loop, no cartesian") {
    val p = plan("q40_embed_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q44 SRP-LSH pair generation has no quadratic join operator") {
    val p = plan("q44_cross_batch_dup")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q45 multimodal decode is a narrow map — no exchange before features") {
    // binary payloads must never cross a shuffle; the single sort at the
    // end (ORDER BY doc_id) is the only exchange in the plan
    val p = plan("q45_media_features")
    // formatted mode prints each node in the tree AND a "(n) Exchange"
    // detail header — count the headers (one per physical node)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).length
    assert(p.contains("MapPartitions"), p.take(2000))
    assert(exchanges <= 1, s"expected only the final sort exchange:\n${p.take(3000)}")
  }

  test("NO query plans a quadratic join operator (whole-surface sweep)") {
    // the one antipattern that silently survives small-scale testing and
    // dies at 100 TB: every declared query must plan without cartesian /
    // nested-loop joins
    Queries.all.foreach { q =>
      val p = plan(q.name)
      assert(!p.contains("CartesianProduct"), s"${q.name} plans a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"${q.name} plans a BroadcastNestedLoopJoin")
    }
  }

  test("q325 cap curve scans events ONCE (spine explodes the collapsed aggregate)") {
    // the 6-cap sweep must ride the per-user collapse, not re-scan the
    // fact table per cap — the explode spine sits ABOVE the first agg
    val p = plan("q325_contribution_cap")
    val scans = "events\\.parquet".r.findAllIn(p).length
    assert(scans === 1, s"expected 1 events scan, got $scans:\n${p.take(3000)}")
  }

  test("q327 threshold curve's RETURNED plan scans documents once (pair machinery pinned)") {
    // the expensive pair generation ran eagerly into the localCheckpoint;
    // the curve plan must read that checkpoint plus ONE corpus scan for
    // the token counts — a second documents scan means the pair subtree
    // leaked back into the lazy plan
    val p = plan("q327_dedup_threshold_curve")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans === 1, s"expected 1 documents scan, got $scans")
    assert(p.contains("ExistingRDD"), p.take(2000))
  }

  test("q328 ring resize is one scan + one broadcast routing join") {
    val p = plan("q328_ring_resize")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans === 1, s"expected 1 documents scan, got $scans")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q90 MAD output plan scans documents ONCE (medianAbsDev pre-computed, broadcast back)") {
    // The med/mad stats are computed eagerly inside Quantiles.medianAbsDev
    // (its own single persisted scan); the RETURNED plan must be one
    // corpus scan + a broadcast join against the tiny stats frame — the
    // old two-pass composition left two scans in the final plan.
    val p = plan("q90_mad_outliers")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans === 1, s"expected 1 documents scan in the q90 plan, got $scans")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q75 span df is a two-stage agg (no Expand), and spans shuffle once for the verdict") {
    val p = plan("q75_span_dedup")
    // distinct-doc frequency is (span, doc) partial -> count, not a
    // count(DISTINCT) Expand pass doubling the exploded span table
    assert(!p.contains("Expand"), p.take(3000))
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("q80 bloom predicate prunes the fact side BEFORE the join exchange") {
    val p = plan("q80_bloom_semijoin")
    assert(p.contains("bloom_might_contain"), p.take(3000))
    assert(p.contains("LeftSemi"), p.take(3000))
    // the formatted details number nodes leaf-up: the node DIRECTLY above
    // the orders scan (id + 1) must be the Filter carrying the bloom
    // predicate — i.e. rows are pruned before anything else touches them
    val scanId = """\((\d+)\) Scan parquet\s*\n[^(]*orders\.parquet""".r
      .findFirstMatchIn(p).map(_.group(1).toInt)
    assert(scanId.isDefined, s"orders scan not found:\n${p.take(3000)}")
    // the Filter details block is header + Input + Condition (~200 chars);
    // the bounded non-greedy window keeps the match inside this block
    val parentBlock = (s"\\(${scanId.get + 1}\\) Filter" +
      "[\\s\\S]{0,400}?bloom_might_contain").r
    assert(parentBlock.findFirstIn(p).isDefined,
      s"bloom filter is not the orders scan's parent:\n${p.take(3000)}")
  }

  test("q56 stratified sample: broadcast rate dim, corpus never shuffled, text never read") {
    val p = plan("q56_stratified_sample")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the only allowed exchanges: the broadcast of the 5-row rate table and
    // the final output ordering — no hash repartition of documents
    assert(!p.contains("hashpartitioning(doc_id"), p.take(3000))
    // membership is a function of doc_id/lang only: the wide columns stay
    // out of the parquet ReadSchema
    assert(!p.contains("n_chars") && !p.contains("source"), p.take(3000))
  }

  test("q58 fixed-size sample plans TakeOrderedAndProject over a narrow scan") {
    val p = plan("q58_fixed_size_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
  }

  test("q65 vocab top-V: partial aggregation and TakeOrderedAndProject, no global sort") {
    val p = plan("q65_vocab_topv")
    // two-stage salted count keeps map-side partials ahead of every exchange
    assert(p.contains("HashAggregate"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("SortExec"), p.take(3000))
  }

  test("q70 decontamination joins the corpus against a BROADCAST benchmark set") {
    val p = plan("q70_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q47 rolling fingerprint is a narrow scan + sort") {
    val p = plan("q47_rolling_fingerprint")
    assert(!p.contains("Join"), p.take(2000))
    assert("""\(\d+\) Exchange""".r.findAllIn(p).length <= 1, p.take(3000))
  }

  test("q143 skyline prune table is BROADCAST; no quadratic join") {
    val p = plan("q143_skyline")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
  }

  test("q151 rolling OLS: all five moment sums share ONE window node") {
    val p = plan("q151_rolling_ols")
    assert("""\(\d+\) Window""".r.findAllIn(p).length == 1, p.take(3000))
  }

  test("q150 systematic sampling has NO per-group window (prefix-sum path)") {
    val p = plan("q150_systematic_sample")
    assert(!p.contains(") Window"), p.take(3000))
  }

  test("q176 star join: dims broadcast, orderdate range pushed to the scan") {
    val p = plan("q176_star_join5")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
  }

  test("the round-8 scan-audit pins hold: no repeated-subtree regression") {
    // Each of these had its shared derivation replicated 4-180x in the
    // plan before the localCheckpoint pins (q220 k-truss: 180 customer
    // scans; measured 5.78 -> 3.27 s at sf0.1). The pins truncate the
    // lineage, so the residual plan must scan the flagged table at most
    // twice — a regression here means a pin was dropped or a new lazy
    // consumer was added upstream of it. Full audit + triage of the
    // deliberately-unpinned flags: SCALING.md "Scan-count audit".
    val pins = Seq(
      "q167_ppjoin" -> "documents", "q174_curation_funnel" -> "documents",
      "q201_clustering_coefficient" -> "customer",
      "q208_link_prediction" -> "customer",
      "q212_blocking_quality" -> "customer", "q220_ktruss" -> "customer",
      "q236_lang_cosine" -> "documents",
      "q249_markov_stationary" -> "events",
      "q308_fellegi_sunter" -> "documents",
      "q309_funnel_exclusion" -> "events",
      "q313_skipgram_pairs" -> "documents",
      "q334_blocking_width_curve" -> "customer")
    pins.foreach { case (name, table) =>
      val p = plan(name)
      val scans = s"$table\\.parquet".r.findAllIn(p).length
      assert(scans <= 2, s"$name: $scans $table scans (pin regressed?)")
    }
  }
}
