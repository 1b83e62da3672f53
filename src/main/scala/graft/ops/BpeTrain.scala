package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE merge training — the tokenizer-training kernel (Sennrich
  * et al. 2016) at corpus scale.
  *
  * Scale shape (the one real tokenizer trainers use): the corpus is scanned
  * ONCE and collapsed to a (word, count) table, so every merge round runs
  * on a VOCABULARY-bounded frame — a trillion-token corpus and a 1 GB
  * corpus cost the same per round once word counts exist. State is the
  * positional symbol frame (word, cnt, pos, sym); each round
  *   1. counts adjacent symbol pairs weighted by word count (one
  *      combinable aggregate),
  *   2. picks the argmax pair — max weight, lexicographically smallest
  *      (a, b) on ties, a 1-row bounded driver scalar,
  *   3. applies the merge GREEDILY left-to-right via the run-parity rule:
  *      adjacent matches can only chain when a == b, so grouping matched
  *      positions into consecutive runs and keeping odd run-indexes IS
  *      the greedy non-overlapping selection — pure windows, no fold, and
  *      the exact construction a SQL oracle replays as unrolled CTEs.
  *
  * Determinism: pair counts are integer sums, the argmax tie-break is
  * total, and merge application is a pure function of (state, pair) — so
  * the merge list is partition-order-independent and bit-replayable.
  */
object BpeTrain {

  /** One learned merge: `weight` = summed word-count of the pair's
    * adjacent occurrences when chosen; `nPairTypes` = distinct adjacent
    * pair types observed that round (vocab-health signal: it shrinks as
    * merges absorb frequent pairs).
    */
  final case class Merge(round: Int, symA: String, symB: String,
                         weight: Long, nPairTypes: Long)

  /** Character-symbolized positional state (word, cnt, pos, sym),
    * pos 1-based — split into single characters.
    */
  def symbolize(words: DataFrame, wordCol: String, cntCol: String)
      : DataFrame =
    // filter the split: Spark's split keeps a trailing "" element on some
    // versions (Java split with limit -1); an empty symbol would be a
    // phantom position the oracle's substring enumeration never emits
    words.select(col(wordCol).as("w"), col(cntCol).as("cnt"),
        posexplode(filter(split(col(wordCol), ""),
          x => x =!= lit(""))).as(Seq("p", "sym")))
      .select(col("w"), col("cnt"), (col("p") + 1).as("pos"), col("sym"))

  /** Run `rounds` merge rounds over (word, count) rows; returns the
    * learned merges (possibly fewer than `rounds` if pairs run dry) and
    * the final positional state.
    */
  def train(words: DataFrame, wordCol: String, cntCol: String, rounds: Int)
      : (Seq[Merge], DataFrame) = {
    require(rounds >= 0, s"rounds=$rounds must be >= 0")
    var st = symbolize(words, wordCol, cntCol).localCheckpoint(true)
    val byW = Window.partitionBy(col("w")).orderBy(col("pos"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val withNext = st.withColumn("nx", lead(col("sym"), 1).over(byW))
      val pc = withNext.filter(col("nx").isNotNull)
        .groupBy(col("sym"), col("nx")).agg(sum(col("cnt")).as("pc"))
      // argmax, weight, and distinct-pair-type count in ONE combinable
      // aggregate over the vocab²-bounded pair table (no sort, no second
      // count job): MaxScoreMinKey over a struct key is exactly the
      // (weight desc, lexicographic) tie-break
      val top = pc.agg(
        graft.functions.ArgExtremum.maxScoreMinKey(col("pc"),
          struct(col("sym"), col("nx"))).as("best"),
        max(col("pc")).as("wgt"),
        count(lit(1)).as("npt")).collect()
      if (top(0).isNullAt(0)) dry = true
      else {
        val best = top(0).getStruct(0)
        val a = best.getString(0)
        val b = best.getString(1)
        val wgt = top(0).getLong(1)
        val nPt = top(0).getLong(2)
        merges += Merge(r, a, b, wgt, nPt)
        val matched = withNext
          .filter(col("sym") === lit(a) && col("nx") === lit(b))
          .select(col("w"), col("pos"))
        val runs = matched
          .withColumn("grp", col("pos") - row_number().over(byW))
        val sel = runs
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("w"), col("grp")).orderBy(col("pos"))))
          .filter(col("rn") % 2 === 1).select(col("w"), col("pos"))
        val dropped = sel.select(col("w"), (col("pos") + 1).as("pos"))
        st = st
          .join(sel.withColumn("mg", lit(1L)), Seq("w", "pos"), "left")
          .join(dropped.withColumn("dp", lit(1L)), Seq("w", "pos"), "left")
          .filter(col("dp").isNull)
          .select(col("w"), col("cnt"), col("pos"),
            when(col("mg") === 1L, concat(lit(a), lit(b)))
              .otherwise(col("sym")).as("sym"))
          .withColumn("pos", row_number().over(byW))
          .localCheckpoint(true)
        r += 1
      }
    }
    (merges.toSeq, st)
  }

  /** The merge list as a DataFrame (round, sym_a, sym_b, weight,
    * n_pair_types) — empty-safe with a pinned schema.
    */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("sym_a", StringType, nullable = false),
      StructField("sym_b", StringType, nullable = false),
      StructField("weight", LongType, nullable = false),
      StructField("n_pair_types", LongType, nullable = false)))
    val rows = merges.map(m => org.apache.spark.sql.Row(
      m.round.toLong, m.symA, m.symB, m.weight, m.nPairTypes))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Reload a merge list previously written via [[mergesDf]] (through
    * the warehouse — parquet/[[graft.sources.PartitionedStore]]) back
    * into the trainer's ORDERED form — the artifact-management half of
    * the tokenizer lifecycle: train once, persist the merges, encode
    * anywhere. Order comes from the `round` column, never file order
    * (parquet readers don't preserve row order). The collect is
    * vocab-budget-bounded (= the trained `rounds`), the same bounded
    * driver scalar the trainer itself holds.
    */
  def loadMerges(df: DataFrame): Seq[Merge] = {
    val out = df
      .select(col("round"), col("sym_a"), col("sym_b"), col("weight"),
        col("n_pair_types"))
      .collect()
      .map(r => Merge(r.getLong(0).toInt, r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_.round).toSeq
    // a directory that accumulated two trainings' artifacts (or a
    // versioned append store read without keep-last) would otherwise
    // yield a silently-corrupted merge list
    require(out.map(_.round) == (1 to out.size),
      s"merge artifact has duplicate/missing rounds: ${out.map(_.round)}")
    out
  }
}
