package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT weighted median — the importance-weighted centre
  * ([[Quantiles]]' sibling for weighted data: sampling weights, token
  * counts, trade sizes).
  *
  * Definition (lower weighted median): the smallest value v whose
  * cumulative weight reaches half the total, 2·cum(v) ≥ W. With equal
  * weights this is the classic lower median; with integer weights it is
  * EXACT — no float enters the decision.
  *
  * Scale shape: identical values collapse to (group, v, Σw) FIRST (map-
  * side combinable — a heavy-hitter value arrives at the sort as one
  * row), then [[PrefixSum.withRunningSum]] provides the cumulative
  * weight over a range-partitioned sort — a giant group spans many
  * partitions, no per-group window task, no value buffer. The median is
  * then found DISTRIBUTIVELY by its crossing-point characterization:
  * the unique row with 2·(cum − w) < W ≤ 2·cum. One filter, one row per
  * group out — the selection never touches the driver (contrast
  * [[Quantiles.exact]], whose rank bookkeeping is driver-resident by
  * design; here the needed rank is a per-row predicate).
  */
object WeightedMedian {

  /** Lower weighted median of `valueCol` under integer weights
    * `weightCol`, per group. Output: groupCols…, `wmedian`,
    * `total_weight`. Weights must be non-negative; zero-total groups are
    * dropped (no median exists).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
               weightCol: String, partitions: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val collapsed = df
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    val cum = PrefixSum.withRunningSum(
      collapsed, groupCols, Seq(valueCol), "__w", "__cum", partitions)
    val tot = collapsed.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__w")).as("__tot"))
      .filter(col("__tot") > 0L)
    cum.join(broadcast(tot), groupCols)
      .filter(col("__cum") * 2 >= col("__tot") &&
        (col("__cum") - col("__w")) * 2 < col("__tot"))
      .select((groupCols.map(col) :+
        col(valueCol).as("wmedian") :+
        col("__tot").as("total_weight")): _*)
  }

  /** Lower weighted quantiles at RATIONAL positions `qs = (num, den)`
    * (e.g. quartiles `Seq((1,4),(1,2),(3,4))`): per q, the smallest v
    * with den·cum ≥ num·W. Same machinery as [[perGroup]], still exact
    * integers; the q list rides an exploded literal array (a Generate,
    * not a cross join — no BNLJ enters the plan), so all quantiles come
    * from the ONE prefix-summed pass. Output: groupCols…, q_num, q_den,
    * wquantile, total_weight. Requires 1 ≤ num ≤ den.
    */
  def perGroupQuantiles(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, weightCol: String,
                        qs: Seq[(Int, Int)],
                        partitions: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(qs.nonEmpty && qs.forall { case (n, d) => n >= 1 && n <= d },
      s"quantile rationals must satisfy 1 <= num <= den: $qs")
    val collapsed = df
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    val cum = PrefixSum.withRunningSum(
      collapsed, groupCols, Seq(valueCol), "__w", "__cum", partitions)
    val tot = collapsed.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__w")).as("__tot"))
      .filter(col("__tot") > 0L)
    cum.join(broadcast(tot), groupCols)
      .withColumn("__q", explode(typedlit(qs)))
      .filter(col("__cum") * col("__q._2") >= col("__q._1") * col("__tot") &&
        (col("__cum") - col("__w")) * col("__q._2") <
          col("__q._1") * col("__tot"))
      .select((groupCols.map(col) :+
        col("__q._1").cast("long").as("q_num") :+
        col("__q._2").cast("long").as("q_den") :+
        col(valueCol).as("wquantile") :+
        col("__tot").as("total_weight")): _*)
  }
}
