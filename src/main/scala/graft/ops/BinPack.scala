package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contiguous prefix-packing — the compaction planner's bin assignment
  * (coalesce many small partitions/files into ~target-sized units: the
  * small-files problem every 100 TB table hits at ingest).
  *
  * Algorithm: items ordered by (size DESC, id) take
  * `bin = cum_exclusive div target` off ONE range-partitioned running
  * sum ([[PrefixSum]] — never a one-task global window). This is the
  * distributed form of next-fit-decreasing:
  *
  *  - mid-sequence bins never underfill: each one's contents straddle a
  *    contiguous [k·target, (k+1)·target) slice of the cumulative axis,
  *    so its fill is ≥ target minus its first item's head — and can
  *    overflow by at most that one straddling item
  *    (fill < target + max_item);
  *  - descending size order puts the big items first, so straddling
  *    items late in the sequence are as small as the inventory allows —
  *    the classic NFD shape (FFD's tighter 11/9 bound needs a
  *    sequential back-scan over open bins that a distributed plan can't
  *    afford, and compaction doesn't need);
  *  - the assignment is a pure function of the running sum:
  *    deterministic, exactly replayable by a window sum in any engine,
  *    stable under re-partitioning.
  *
  * `sizeCol` must be a non-null non-negative long; `idCol` must make
  * (size, id) a total order within each group. Output: groupCols…,
  * idCol, sizeCol, `bin` (0-based long, per group).
  */
object BinPack {

  def assignBins(df: DataFrame, groupCols: Seq[String], idCol: String,
                 sizeCol: String, target: Long): DataFrame = {
    require(target > 0, s"target must be positive: $target")
    val (gdf, gc) =
      if (groupCols.nonEmpty) (df, groupCols)
      else (df.withColumn("__g", lit(0)), Seq("__g"))
    val ranked = PrefixSum.withRunningSum(
      gdf.withColumn("__negsz", -col(sizeCol)),
      gc, Seq("__negsz", idCol), sizeCol, "__cum")
    val out = ranked
      .withColumn("bin",
        expr(s"(__cum - $sizeCol) div ${target}L").cast("long"))
      .drop("__negsz", "__cum", "__g")
    out.select((groupCols ++ Seq(idCol, sizeCol, "bin")).map(col): _*)
  }
}
