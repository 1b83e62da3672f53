package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication: within-CLUSTER embedding
  * near-duplicate pruning (Abbas et al. 2023, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication").
  *
  * The technique's scale insight is the clustering itself: candidate pairs
  * are only generated INSIDE a cluster, so the pair work is Σ|cell|², not
  * |corpus|² — with k cells of balanced size that is a k× reduction, and
  * the cell is an equi-join key so the work shards perfectly. At 100 TB the
  * cell comes from the trained coarse quantizer ([[Knn.kmeansCentroids]] +
  * [[Knn.kmeansAssign]], the q54/q66 machinery — train on a sample, stamp
  * cells at ingest); a pre-existing cluster/label column slots in directly
  * (the q48 IVF precedent).
  *
  * Pruning rule (deterministic greedy, the paper's "keep one per duplicate
  * neighborhood" made order-stable): a vector is DROPPED iff some
  * lower-id vector in the same cell has cosine ≥ threshold to it. The
  * lowest id of every near-dup neighborhood always survives; survival is
  * independent of execution order or partitioning (no race on "which of
  * the pair goes", unlike iterative greedy scans).
  *
  * Execution shape: same-cell pairs via the block-tiled exact pair join
  * ([[Knn.nearDuplicatePairs]] with the cell as an extra equi-key — no
  * BNLJ, bounded per-task memory), then one anti-join of the corpus
  * against the distinct dropped-id set. Cosine is rounded to 6dp before
  * the threshold compare (engine-independent edge).
  */
object SemDeDup {

  /** Keep the rows that survive within-cell near-dup pruning. */
  def prune(emb: DataFrame, idCol: String, vecCol: String, cellCol: String,
            threshold: Double, blocks: Int = 0): DataFrame = {
    val dropped = Knn.nearDuplicatePairs(emb, idCol, vecCol, threshold,
        blocks, cellCol = Some(cellCol))
      // pairs are normalized (vec_a < vec_b): the greater id is the drop
      .select(col("vec_b").as(idCol)).distinct()
    emb.join(dropped, Seq(idCol), "left_anti")
  }
}
