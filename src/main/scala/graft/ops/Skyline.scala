package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, maximize both axes) — the
  * multi-objective "no row is better on both dimensions" filter.
  *
  * Scale design: the naive formulations are a self-join (quadratic) or a
  * per-group sort window over the FULL input (serializes each group onto
  * one task). Instead:
  *
  *  1. bucket-prune — bucket the x axis (`x div bucketWidth`), take
  *     per-(group, bucket) max of y (a tiny combinable aggregate), build
  *     the strictly-higher-bucket suffix max, and broadcast it. Any row
  *     whose y is ≤ the suffix max of its bucket is beaten by a row with
  *     strictly larger x and ≥ y — dominated, dropped. Survivors are
  *     frontier-sized (the frontier plus border-bucket rows), not
  *     input-sized.
  *  2. exact dominance windows on the survivors — max(y) over x' > x
  *     (RANGE (1, ∞)) and over x' ≥ x (RANGE (0, ∞)); a row stays iff
  *     neither strictly beats it.
  *
  * Prune soundness: a pruned row is dominated by construction; dominance
  * is transitive, so every true frontier row survives the prune and the
  * exact pass over survivors equals the exact pass over the full input.
  * Ties (equal on both axes) are mutually non-dominating — both kept.
  *
  * `xCol` must be integral (bucketed with `div`); `yCol` any ordered type
  * (exact DECIMAL recommended — double sums are order-nondeterministic
  * and can flip near-tie dominance). Both must be non-null.
  */
object Skyline {

  def skyline2d(
      df: DataFrame, groupCols: Seq[String], xCol: String, yCol: String,
      bucketWidth: Long = 2): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val grp: Seq[Column] =
      if (groupCols.nonEmpty) groupCols.map(col) else Seq(lit(1))
    val x = col(xCol)
    val y = col(yCol)

    val b = df.withColumn("__bkt", expr(s"$xCol div $bucketWidth"))
    val wSuff = Window.partitionBy(grp: _*).orderBy(col("__bkt"))
      .rangeBetween(1, Window.unboundedFollowing)
    val suff = b.groupBy(grp :+ col("__bkt"): _*)
      .agg(max(y).as("__bv"))
      .withColumn("__suff", max(col("__bv")).over(wSuff))
      .drop("__bv")
    val cand = b.join(broadcast(suff),
        groupCols :+ "__bkt", "inner")
      .filter(col("__suff").isNull || col("__suff") < y)

    val w1 = Window.partitionBy(grp: _*).orderBy(x)
      .rangeBetween(1, Window.unboundedFollowing)
    val w2 = Window.partitionBy(grp: _*).orderBy(x)
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    cand
      .withColumn("__mx_gt", max(y).over(w1))
      .withColumn("__mx_ge", max(y).over(w2))
      .filter((col("__mx_gt").isNull || col("__mx_gt") < y) &&
        col("__mx_ge") <= y)
      .drop("__bkt", "__suff", "__mx_gt", "__mx_ge")
  }
}
