package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (community detection) — the graph
  * family's structure finder ([[Bfs]] answers reachability,
  * connected components answers connectivity; LPA answers "which densely
  * linked cluster are you in").
  *
  * Determinism: classic LPA breaks score ties randomly and oscillates;
  * here every round is a pure function of the previous labeling — each
  * vertex adopts the label with the highest neighbor count, ties to the
  * LEXICOGRAPHICALLY SMALLEST label — and the round count is fixed, so
  * the result is partition-order-independent and exactly replayable
  * (the q134 oracle unrolls the rounds as CTEs).
  *
  * Scale shape per round: one edge⋈labels equi-join (labels is a
  * |V|-row table), a (vertex, label) count — combinable, a hub's
  * million neighbor labels collapse map-side — then argmax WITHOUT a
  * per-vertex window: max-count per vertex (combinable) + an equi-join
  * back + min-label at the max (combinable). `localCheckpoint` cuts the
  * per-round lineage, the same discipline as [[Bfs]]/[[PageRank]].
  */
object LabelProp {

  /** `rounds` synchronous LPA rounds over DIRECTED edges (symmetrize
    * first for undirected graphs). Initial label of a vertex is itself.
    * Returns (vCol, label).
    */
  def communities(edges: DataFrame, aCol: String, bCol: String,
                  rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds=$rounds must be >= 0")
    // persist the edge projection once — the per-round join otherwise
    // re-runs the caller's edge derivation `rounds`+1 times (the round-9
    // measured scan audit's Bfs finding; same fix)
    val e = edges.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = e.select(col("__a").as("__v"))
        .union(e.select(col("__b")))
        .distinct()
        .withColumn("__lab", col("__v"))
        .localCheckpoint(true)
      for (_ <- 1 to rounds) {
        val nbr = e.join(labels, col("__a") === col("__v"))
          .select(col("__b").as("__v"), col("__lab"))
          .groupBy("__v", "__lab").agg(count(lit(1)).as("__c"))
        // argmax in ONE combinable aggregate (max count, min label on
        // ties) — the max + join-back + min form costs an extra exchange
        // and join per round; MaxScoreMinKey folds it into the hash
        // aggregate (semantics pinned identical by LabelPropSpec)
        val adopted = nbr.groupBy("__v").agg(
          graft.functions.ArgExtremum
            .maxScoreMinKey(col("__c"), col("__lab")).as("__new"))
        // a vertex with no in-neighbors keeps its label (only possible on
        // directed input; a symmetrized graph always adopts)
        labels = labels.join(adopted, Seq("__v"), "left")
          .select(col("__v"),
            coalesce(col("__new"), col("__lab")).as("__lab"))
          .localCheckpoint(true)
      }
      labels.select(col("__v").as("v"), col("__lab").as("label"))
    } finally e.unpersist(blocking = false)
  }
}
