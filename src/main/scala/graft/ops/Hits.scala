package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed HITS (Kleinberg's hubs & authorities) over an edge list,
  * in the same scaled-integer discipline as [[PageRank]].
  *
  * Update rule, max-normalized so every score stays on the integer grid
  * `0..scale`:
  *
  *   authRaw(v) = Σ_{u→v} hub(u)          (exact: decimal sum)
  *   auth(v)    = (authRaw · scale) div max_w authRaw(w)
  *   hubRaw(u)  = Σ_{u→v} auth(v)
  *   hub(u)     = (hubRaw · scale) div max_w hubRaw(w)
  *
  * Why max-normalization instead of the textbook L2: the L2 norm needs a
  * square root, which is where cross-engine replay dies (libm last-ulp);
  * max-normalization is pure integer arithmetic — sums, one max, one
  * multiply, one floor division — so the result is bit-identical under
  * any partitioning and exactly replayable as unrolled CTEs by the
  * DuckDB oracle, the q116/q178 convention for iterative graph
  * operators. Ranking is unaffected (both norms are monotone rescales).
  *
  * Overflow discipline: the raw sums run in DECIMAL(38,0) (authRaw ≤
  * indeg·scale can exceed int64 at hub fan-in beyond ~9.2e6 with the
  * 1e12 default scale — the same cliff q164 widened past), and the
  * rescale multiplies inside decimal before the integral `div` brings
  * the score back to BIGINT ≤ scale. Headroom: authRaw·scale ≤
  * n·scale² = 1e33 at a billion vertices — 5 decimal digits to spare.
  *
  * Scale shape per iteration: two equi-joins (edges⋈scores), two hash
  * aggregations, two 1-row maxima carried by broadcast cross joins —
  * never a driver round-trip. Job count is a fixed small constant.
  * Per-iteration results are `localCheckpoint`ed (the standard lineage
  * barrier, as in [[PageRank]]/[[ConnectedComponents]]).
  */
object Hits {

  /** (v, auth, hub) for every vertex of the simple digraph (self-loops
    * dropped, duplicate edges collapsed). Scores are scaled longs in
    * `0..scale`; at least one vertex has auth = scale and one has
    * hub = scale (the normalization anchors).
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iterations: Int = 4,
            scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && scale > 0,
      s"need iterations >= 1 and scale > 0, got $iterations, $scale")
    val e = edges
      .select(col(srcCol).as("s"), col(dstCol).as("d"))
      .filter(col("s") =!= col("d")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = e.select(col("s").as("v"))
      .union(e.select(col("d").as("v"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // loud-by-design on an empty graph: the max-normalization divides by
    // the largest raw score, which only exists when there is ≥ 1 edge.
    val nEdges = e.limit(1).count()
    require(nEdges > 0, "HITS over an empty graph")

    /** One half-step: raw = Σ over `joinKey` of the partner score along
      * the edge, then rescale to max = `scale`. outKey is the grouped
      * (receiving) endpoint. Zero-score vertices are simply ABSENT from
      * the intermediate result — they contribute nothing to the next
      * half-step's inner join, so the full vertex set (with coalesced
      * zeros) is restored only once, in the final output join; carrying
      * it through every half-step cost one extra join × 8 half-steps in
      * the first cut of this operator.
      */
    def halfStep(scores: DataFrame, scoreCol: String,
                 joinKey: String, outKey: String,
                 outCol: String): DataFrame = {
      val raw = e
        .join(scores.select(col("v").as(joinKey), col(scoreCol)), joinKey)
        .groupBy(col(outKey).as("v"))
        .agg(sum(col(scoreCol).cast("decimal(38,0)")).as("__raw"))
      val m = raw.agg(max(col("__raw")).as("__m"))
      raw.crossJoin(m)
        .select(col("v"), expr(s"(__raw * ${scale}L) div __m").as(outCol))
    }

    try {
      var hub = verts.withColumn("hub", lit(scale)).localCheckpoint(true)
      var auth: DataFrame = null
      var iter = 0
      while (iter < iterations) {
        // intermediate auths feed exactly one consumer (the hub half-step
        // of the same iteration), so only the LAST auth — referenced by
        // both the final hub step and the output join — is checkpointed;
        // hub checkpoints every iteration, keeping lineage depth at two
        // half-steps. (Checkpointing both halves measured 3.8 s at sf0.1
        // vs 2.6 s for this shape — eager materializations, not plans.)
        auth = halfStep(hub, "hub", "s", "d", "auth")
        if (iter == iterations - 1) auth = auth.localCheckpoint(true)
        val nextHub =
          halfStep(auth, "auth", "d", "s", "hub").localCheckpoint(true)
        hub.unpersist(blocking = false)
        hub = nextHub
        iter += 1
      }
      // materialized (|V| rows) BEFORE the finally releases e/verts — a
      // lazy result over unpersisted parents would re-scan the corpus at
      // evaluation time (the q177-advice hazard, same device as KCore).
      verts
        .join(auth, Seq("v"), "left")
        .join(hub, Seq("v"), "left")
        .select(col("v"),
          coalesce(col("auth"), lit(0L)).as("auth"),
          coalesce(col("hub"), lit(0L)).as("hub"))
        .localCheckpoint(true)
    } finally {
      e.unpersist(blocking = false)
      verts.unpersist(blocking = false)
    }
  }
}
