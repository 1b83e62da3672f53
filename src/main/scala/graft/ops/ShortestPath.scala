package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bounded-hop single-source shortest paths by Bellman–Ford relaxation,
  * in pure long arithmetic.
  *
  * Why bounded rounds: on a distributed engine the natural shortest-path
  * schedule is synchronous relaxation — each round improves every vertex's
  * tentative distance using its in-edges once. `rounds` rounds yield the
  * exact shortest distances among paths of ≤ `rounds` edges; with
  * rounds ≥ |V|−1 that is the full Bellman–Ford fixpoint. A fixed small
  * round count keeps the job count constant and independent of data size
  * (the same contract as [[PageRank]]), which is what a 100 TB graph needs:
  * convergence-detection loops (`while changed`) put a driver-blocking
  * `count()` in every round; a bounded unrolled plan does not.
  *
  * Exactness: distances are sums of long weights and `min` is a total order
  * on longs, so the result is bit-identical under any partitioning, shuffle
  * order, or AQE re-plan — and exactly replayable by another engine as
  * `rounds` unrolled min-aggregation CTEs (no tolerance gate).
  *
  * Scale shape per round: one equi-join frontier⋈edges hash-partitioned on
  * the source vertex and one min-aggregation hash-partitioned on the
  * destination — both map-side combinable (min is algebraic). The edge list
  * is persisted once; per-round results are eagerly `localCheckpoint`ed,
  * the standard lineage barrier for iterative DataFrame algorithms
  * (without it Catalyst re-analyzes a plan that doubles per round).
  *
  * Negative weights are rejected: with them a bounded-round prefix is not
  * monotone (a longer path can later undercut), so the ≤`rounds`-edges
  * semantics would silently change meaning.
  */
object ShortestPath {

  /** (v, dist) for every vertex reachable from `source` in ≤ `rounds`
    * edges; `dist` is the exact minimum path weight among those paths.
    * `source` must be a 1+-row DataFrame of vertex ids in column `v`
    * (multi-source is the standard trick for forests of seeds — each
    * vertex gets the distance to its NEAREST seed). Parallel edges
    * collapse to their cheapest weight.
    */
  def boundedPaths(edges: DataFrame, srcCol: String, dstCol: String,
                   weightCol: String, source: DataFrame,
                   rounds: Int): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val e = edges
      .select(col(srcCol).as("s"), col(dstCol).as("d"),
        col(weightCol).cast("long").as("w"))
      .groupBy(col("s"), col("d")).agg(min(col("w")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Fail loud up front (and materialize the persisted edge list in the
      // same pass) rather than returning a silently wrong bounded prefix.
      val neg = e.filter(col("w") < 0).limit(1).count()
      require(neg == 0, "boundedPaths requires non-negative edge weights")
      var dist = source.select(col("v"), lit(0L).as("dist"))
        .localCheckpoint(true)
      var iter = 0
      while (iter < rounds) {
        val relaxed = dist.select(col("v").as("s"), col("dist"))
          .join(e, "s")
          .select(col("d").as("v"), (col("dist") + col("w")).as("dist"))
        val next = dist.unionByName(relaxed)
          .groupBy(col("v")).agg(min(col("dist")).as("dist"))
          .localCheckpoint(true)
        dist.unpersist(blocking = false)
        dist = next
        iter += 1
      }
      dist
    } finally e.unpersist(blocking = false)
  }
}
