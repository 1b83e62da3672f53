package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60

/** Deterministic train/val/test split assignment by key hash — the
  * dataset-split stage of a training pipeline.
  *
  * Assignment is a pure function of (salt, key): re-runs, re-partitioning,
  * cluster size, and ingestion order cannot move a row between splits, and
  * newly ingested rows get labels without touching existing ones — the
  * property that makes eval sets stable across corpus versions (a random()
  * split silently leaks val rows into train on every rebuild).
  *
  * Scale shape: one codegen'd md5 per row, no shuffle, no state — the
  * label column rides the scan. Downstream per-split writes partition by
  * the label (3 dynamic partitions), which is the only exchange involved.
  */
object Split {

  val Default: Seq[(String, Double)] =
    Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05)

  /** Uniform [0,1) draw from (salt, key) — the q56 portable construction
    * (15-hex-digit md5 prefix / 2^60), replayable verbatim in the oracle.
    */
  def unit(keyCol: Column, salt: String): Column =
    hash60(concat(lit(s"$salt:"), keyCol.cast("string")))
      .cast("double") / lit(1152921504606846976.0) // 2^60

  /** Add `labelCol` with the split name; `fractions` must sum to 1 (the
    * last band absorbs the remainder so every row gets a label).
    */
  def assign(df: DataFrame, keyCol: String, salt: String = "split",
             fractions: Seq[(String, Double)] = Default,
             labelCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val u = unit(col(keyCol), salt)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    // bands [0,c1), [c1,c2), ...; the final otherwise absorbs u in the last
    // band (and any 1.0-boundary residue).
    val label = fractions.init.zip(cum.init)
      .foldLeft(org.apache.spark.sql.functions.when(lit(false), lit(""))) {
        case (acc, ((name, _), c)) => acc.when(u < lit(c), lit(name))
      }
      .otherwise(lit(fractions.last._1))
    df.withColumn(labelCol, label)
  }
}
