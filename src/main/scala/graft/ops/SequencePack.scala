package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — documents → fixed-length training sequences.
  *
  * An LLM training pipeline doesn't feed documents to the model; it feeds
  * fixed-length token sequences cut from the concatenation of all documents
  * in a deterministic order (the step after [[PrefixSum]]-based shard
  * planning, reference's ETL being the upstream of exactly such a trainer —
  * SURVEY.md LLM-extension list). Packing assigns every document the
  * sequence(s) it lands in and where, without ever materializing the
  * concatenated token stream:
  *
  *  1. the document's global token START offset within its group =
  *     running-sum(tokens) − tokens, via the distributed
  *     [[PrefixSum.withRunningSum]] (range partition + driver-stitched
  *     offsets — the window form would serialize each group onto one core);
  *  2. the sequences a document overlaps are then pure per-row arithmetic:
  *     first = ⌊start/L⌋, last = ⌊(start+ntok−1)/L⌋ — an `explode(sequence)`
  *     over that closed range (guarded so ntok=0 emits one empty slice,
  *     since Spark's `sequence(a,b)` DESCENDS when b<a);
  *  3. slice geometry per (doc, seq): intersection of the doc's global
  *     token interval [start, start+ntok) with the sequence's
  *     [seq·L, (seq+1)·L).
  *
  * Output: groupCols…, orderCols…, tokenCol, plus
  *  - `seq_id`      — sequence index WITHIN the group (each group packs its
  *                    own sequence stream; (group…, seq_id) is the global
  *                    sequence key);
  *  - `doc_tok_start` — offset within the document where this slice begins;
  *  - `seq_tok_start` — offset within the sequence where the slice lands;
  *  - `n_tok`       — slice length (0 only for empty documents).
  *
  * Every sequence except a group's last is exactly `seqLen` tokens — no
  * padding waste; the caller chooses whether boundary-crossing slices are
  * concatenated (causal LM) or masked (instruction tuning).
  *
  * Scale shape: one range shuffle (inside PrefixSum), then narrow
  * projections + a generator whose fan-out is 1 + ntok/seqLen per doc —
  * no further shuffle, no per-group serialization, no driver state beyond
  * PrefixSum's |partitions|×|groups| offset map. Offsets are exact in Long
  * (floor-division goes through double, exact below 2^53 total tokens per
  * group — 100 TB of text ≈ 2.5·10^13 tokens, 300× under the limit).
  */
object SequencePack {

  def pack(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
           tokenCol: String, seqLen: Long, partitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val withCum = PrefixSum.withRunningSum(
      df, groupCols, orderCols, tokenCol, "__cum", partitions)
    val bounds = withCum
      .withColumn("__start", col("__cum") - col(tokenCol))
      .withColumn("__first", floor(col("__start") / lit(seqLen)).cast("long"))
      .withColumn("__last", floor(
        (col("__start") + greatest(col(tokenCol), lit(1L)) - lit(1L)) /
          lit(seqLen)).cast("long"))
    // generator in its own select (Spark rejects generators nested inside
    // other expressions), geometry in the next
    bounds
      .withColumn("seq_id", explode(sequence(col("__first"), col("__last"))))
      .withColumn("__lo", greatest(col("__start"), col("seq_id") * lit(seqLen)))
      .withColumn("__hi", least(col("__start") + col(tokenCol),
        (col("seq_id") + lit(1L)) * lit(seqLen)))
      .select((groupCols ++ orderCols).map(col) ++ Seq(
        col(tokenCol),
        col("seq_id"),
        (col("__lo") - col("__start")).as("doc_tok_start"),
        (col("__lo") - col("seq_id") * lit(seqLen)).as("seq_tok_start"),
        (col("__hi") - col("__lo")).as("n_tok")): _*)
  }
}
