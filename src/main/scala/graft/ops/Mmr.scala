package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance diversification: greedily re-rank each query's
  * candidate list so every pick trades relevance against similarity to the
  * items already picked — the standard diversity pass behind retrieval /
  * RAG-context selection (the reference's consumers rank top-k per symbol
  * with no diversity notion; this is the training-data extension).
  *
  * score(c) = rel(c) - max_{s in picked} sim(c, s)   (λ = 0.5 MMR, whose
  * 0.5·(rel − maxsim) ranking is monotone in the difference, so the λ factor
  * never needs to materialize). Scores are INTEGER (callers pass
  * e.g. round(cos·1e6)), so selection is exact and partition-order-free;
  * ties break to the smallest id.
  *
  * Scale shape: the greedy loop is k-1 rounds of per-query joins over the
  * CANDIDATE lists (bounded, say 20 per query) — never over the corpus.
  * Every step is an equi-join on the query key plus a combinable
  * max-of-struct argmax; `localCheckpoint` cuts lineage growth (same
  * discipline as [[PageRank]]). Nothing is collected to the driver, so a
  * billion queries diversify in parallel.
  */
object Mmr {

  /** Greedy-diversify `cands` into the top `k` per query.
    *
    * @param cands one row per (query, candidate): `qCol`, `idCol`, `relCol`
    *              (integer relevance — exact math is the caller's contract)
    * @param sims  symmetric pairwise similarities WITHIN each query's
    *              candidate list: `qCol`, `idCol`, `idBCol`, `simCol`
    *              (integer; both orientations present, self-pairs absent)
    * @return (qCol, idCol, relCol, step) — step 1..k in pick order; queries
    *         with fewer than k candidates yield as many steps as they have
    */
  def diversify(cands: DataFrame, sims: DataFrame, qCol: String, idCol: String,
                relCol: String, idBCol: String, simCol: String,
                k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val c = cands.select(col(qCol).as("__q"), col(idCol).as("__id"),
      col(relCol).as("__rel"))
    val s = sims.select(col(qCol).as("__q"), col(idCol).as("__a"),
      col(idBCol).as("__b"), col(simCol).as("__sim"))

    // step 1: pure relevance argmax (combinable max-of-struct; -id tiebreak)
    def pick(scored: DataFrame, step: Int): DataFrame =
      scored.groupBy(col("__q"))
        .agg(max(struct(col("__score"), (-col("__id")).as("__nid"),
          col("__rel"))).as("__w"))
        .select(col("__q"), (-col("__w.__nid")).as("__id"),
          col("__w.__rel").as("__rel"), lit(step).as("step"))

    var picked = pick(c.withColumn("__score", col("__rel")), 1)
      .localCheckpoint(true)

    for (step <- 2 to k) {
      val unpicked = c.join(picked.select(col("__q"), col("__id")),
        Seq("__q", "__id"), "left_anti")
      // max similarity of each unpicked candidate to the picked set
      val maxsim = s
        .join(picked.select(col("__q"), col("__id").as("__b")),
          Seq("__q", "__b"))
        .groupBy(col("__q"), col("__a"))
        .agg(max(col("__sim")).as("__maxsim"))
        .withColumnRenamed("__a", "__id")
      val scored = unpicked
        .join(maxsim, Seq("__q", "__id"), "left")
        // candidates disjoint from every pick (no sim row) diversify freely
        .withColumn("__score",
          col("__rel") - coalesce(col("__maxsim"), lit(0L)))
      picked = picked.unionByName(pick(scored, step))
        .localCheckpoint(true)
    }
    picked.select(col("__q").as(qCol), col("__id").as(idCol),
      col("__rel").as(relCol), col("step"))
  }
}
