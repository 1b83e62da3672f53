package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source bounded-hop BFS — [[Bfs]] generalized to carry the source
  * label through the expansion, yielding (src, v, dist) for every source
  * and every vertex within `maxHops` of it. This is the primitive behind
  * closeness/harmonic centrality audits and all-pairs-within-k analyses.
  *
  * Scale shape: identical to [[Bfs]] — frontier-only expansion (round h
  * joins ONLY pairs first reached at h-1 against the edge list), reached
  * set deduped by a combinable (src, v) anti-join, `localCheckpoint` per
  * round, drained frontier short-circuits. The difference is the STATE
  * BOUND: rows = Σ_v |B_k(v)| (the k-ball mass over all sources), not
  * |V|. That is linear on bounded-degree / clustered graphs (a dup-group
  * graph, a similarity graph after LSH) but quadratic on a small-diameter
  * hub graph — callers choose `sources` and `maxHops` accordingly (the
  * [[Knn]] `maxDriverQueries`-style contract: keep sources bounded or the
  * graph sparse; never run this on a social-scale giant component with
  * large k).
  */
object MultiBfs {

  /** Distances (0..maxHops) from EVERY vertex of `sources` over DIRECTED
    * edges (aCol → bCol); symmetrize first for undirected graphs.
    * Returns (src, vCol, dist) — one row per (source, reached vertex).
    */
  def perSourceDistances(edges: DataFrame, aCol: String, bCol: String,
                         sources: DataFrame, vCol: String,
                         maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops=$maxHops must be >= 0")
    // materialize the edge list ONCE: every round joins against it, and an
    // expensive upstream derivation (a fuzzy join, an LSH bucket pass)
    // would otherwise re-execute per round — measured 18 s → 2 s on the
    // q204 fuzzy graph at sf0.1. ([[Bfs]]/[[LabelProp]] now persist their
    // edges too: the round-9 runtime scan audit measured their re-scan
    // count rising with graph diameter.)
    val e = edges.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .localCheckpoint(true)
    var dist = sources.select(col(vCol).as("__s")).distinct()
      .select(col("__s"), col("__s").as("__v"))
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    var frontier = dist
    var h = 1L
    while (h <= maxHops && !frontier.isEmpty) {
      val reachedNow = frontier.join(e, col("__v") === col("__a"))
        .select(col("__s"), col("__b").as("__v")).distinct()
        .join(dist.select(col("__s"), col("__v")), Seq("__s", "__v"),
          "left_anti")
        .withColumn("dist", lit(h))
        .localCheckpoint(true)
      dist = dist.unionByName(reachedNow).localCheckpoint(true)
      frontier = reachedNow
      h += 1
    }
    dist.select(col("__s").as("src"), col("__v").as(vCol), col("dist"))
  }
}
