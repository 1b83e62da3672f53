package graft

import org.scalatest.funsuite.AnyFunSuite

/** MEASURED scan-count regression guard — the runtime companion to
  * PlanSpec's plan-text pin check. [[ScanAudit.measuredScans]] materializes
  * each query inside a QueryExecutionListener window, so checkpoint-pin
  * builds, cache builds, and bounded driver bookkeeping all contribute the
  * parquet scans they actually executed. The bounds below are the values
  * measured after the round-9 fixes (full audit: `SPARK_GRAFT_PROBE=scansrt
  * tools/run.sh graft.ScaleProbe`; triage of the deliberately-unfixed
  * flags: SCALING.md "Runtime scan audit"). A regression means a pin was
  * dropped, a small-aggregate reuse was replaced by a re-derivation, or a
  * new consumer was added upstream of a pin — each extra count is one more
  * full corpus pass per materialization at 100 TB.
  */
class RuntimeScanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val bounds: Seq[(String, String, Int)] = Seq(
    // round-9 measured-audit fixes
    ("q170_greedy_cover", "documents", 2),        // was 9: ids pin + checkpointed pick
    ("q334_blocking_width_curve", "customer", 1), // was 7: sample pin
    ("q212_blocking_quality", "customer", 1),     // was 5: sample pin
    ("q117_canonical_select", "documents", 3),    // was 7: window argmax + fp pin
    ("q61_dedup_groups", "documents", 2),         // was 4: collapseByContent fp pin
    ("q339_tfidf_cosine_neardup", "documents", 2), // was 4: no-join-back collapse
    ("q174_curation_funnel", "documents", 1),     // was 3: single-pass funnel
    ("q125_keyness", "documents", 2),             // was 4: vocab-agg pins
    ("q74_cms_counts", "lineitem", 2),            // was 4: exact-agg pin
    // the one SCALE-DEPENDENT finding: Bfs/LabelProp re-derived their lazy
    // edge frame once per round, so q124's corpus scans ROSE with graph
    // diameter (3 at sf0.001 -> 5 at sf0.01); the ops now persist edges
    ("q124_khop_bfs", "documents", 1),
    ("q134_lpa_communities", "documents", 1),
    ("q168_shortest_path", "documents", 2),       // was 3: symmetrize counts, not occurrences
    ("q36_norm_dedup", "documents", 1),
    // the round-8 pinned set, runtime-confirmed (pin builds included)
    ("q220_ktruss", "customer", 2),
    ("q201_clustering_coefficient", "customer", 2),
    ("q208_link_prediction", "customer", 2),
    ("q167_ppjoin", "documents", 1),
    ("q249_markov_stationary", "events", 2),
    ("q236_lang_cosine", "documents", 1),
    ("q308_fellegi_sunter", "documents", 1),
    ("q313_skipgram_pairs", "documents", 1),
    // triaged-at-3: disjoint predicate-pushed event splits (see SCALING.md)
    ("q309_funnel_exclusion", "events", 3),
    ("q217_bigram_fluency", "documents", 3))

  bounds.foreach { case (name, table, bound) =>
    test(s"$name executes <= $bound $table scans per materialization") {
      val counts = ScanAudit.measuredScans(spark)(
        Queries.byName(name).fn(spark, sf))
      val got = counts.getOrElse(table, 0)
      assert(got <= bound,
        s"$name measured $table=$got > $bound (all: $counts)")
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
