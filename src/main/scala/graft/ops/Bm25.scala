package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a corpus against a (small) query-term set —
  * the classic sparse-retrieval ranker, and the data-curation tool for
  * "find training documents relevant to topic X" sweeps.
  *
  * Shape at 100 TB:
  *   - query terms are a handful of strings → BROADCAST; the corpus is
  *     scanned exactly once and never shuffled for term matching.
  *   - per-term document frequency is |terms| rows (a groupBy over the
  *     matched (doc, term) rows with map-side partials) → broadcast back.
  *   - corpus stats (N, avgdl) are one aggregated row → fetched to the
  *     driver (bounded: two scalars) and inlined as literals.
  *   - the only corpus-sized shuffle is the final per-doc score sum, which
  *     carries one row per (matched doc, term) — ≤ |terms| rows per doc —
  *     and the top-k is a TakeOrderedAndProject (per-partition heaps), not
  *     a global sort.
  *
  * Determinism / oracle parity: every float step is written with explicit
  * association mirrored in the DuckDB oracle SQL, contributions are rounded
  * to 6 decimals before the per-doc sum, and the final score is rounded
  * again — libm last-ulp drift between engines cannot cross the rounding
  * boundary at the magnitudes involved.
  */
object Bm25 {

  /** Top-k documents by BM25 score for `terms`.
    *
    * @param docs    corpus with `idCol` and `toksCol` (array&lt;string&gt;)
    * @return (idCol, score) rows, score DESC / id ASC, k rows
    */
  def topK(docs: DataFrame, idCol: String, toksCol: String,
           terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val t = docs.select(col(idCol), col(toksCol).as("__toks"),
      size(col(toksCol)).cast("double").as("__dl"))
    // corpus stats are ONE row — a bounded driver scalar (the q74 sketch
    // precedent), inlined as literals. A join-on-literal-key alternative
    // constant-folds into a BroadcastNestedLoopJoin, which the PlanSpec
    // sweep (rightly) bans; an extra tiny stats job is the better trade.
    val statsRow = t.agg(count(lit(1)).cast("double").as("__n"),
      avg($"__dl").as("__avgdl")).head
    val nDocs = statsRow.getDouble(0)
    // EMPTY corpus: avgdl aggregates to NULL (getDouble would throw) and
    // top-k of nothing is nothing — return the empty frame with the
    // output schema instead of crashing.
    if (nDocs == 0.0)
      return docs.select(col(idCol), lit(0.0).as("score")).limit(0)
    val avgdl = statsRow.getDouble(1)

    // one corpus scan: per-(doc, term) term frequency, zero-tf rows pruned.
    // Terms fan out via explode of a LITERAL array — no join node at all
    // (a crossJoin, even broadcast, plans as BroadcastNestedLoopJoin, the
    // operator the PlanSpec whole-surface sweep bans).
    val tf = t.select(col(idCol), $"__toks", $"__dl",
        explode(typedlit(terms)).as("__term"))
      .select(col(idCol), $"__term",
        size(filter($"__toks", x => x === $"__term")).cast("double").as("__tf"),
        $"__dl")
      .filter($"__tf" > 0)

    val dfc = tf.groupBy($"__term").agg(count(lit(1)).cast("double").as("__df"))

    tf.join(broadcast(dfc), "__term")
      .select(col(idCol),
        round(
          log(lit(1.0) + (lit(nDocs) - $"__df" + 0.5) / ($"__df" + 0.5)) *
            ($"__tf" * (k1 + 1.0)) /
            ($"__tf" + lit(k1) * (lit(1.0 - b) + lit(b) * $"__dl" / lit(avgdl))),
          6).as("__c"))
      .groupBy(col(idCol))
      .agg(round(sum($"__c"), 6).as("score"))
      .orderBy($"score".desc, col(idCol))
      .limit(k)
  }
}
