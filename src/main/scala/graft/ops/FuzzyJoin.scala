package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-1 self-join via deletion-neighborhood blocking (the
  * SymSpell/FastSS construction) — fuzzy key matching at corpus scale:
  * typo clustering over a vocabulary, symbol/entity reconciliation across
  * feeds, OCR-noise dedup.
  *
  * Why this shape: strings within Levenshtein distance 1 always share a
  * member of their deletion neighborhood {s} ∪ {s minus one char} — a
  * substitution meets at the both-sides deletion, an insert/delete meets
  * at the shorter string itself. So candidate generation is an EQUI-join
  * on the exploded variant (shuffle on variant hash), never an all-pairs
  * comparison; sharing a variant does NOT imply distance ≤ 1 ("ab"/"ba"
  * share "a"), so candidates re-verify with exact `levenshtein` after a
  * pair-level distinct. Generalizes to distance k with k-deletion
  * neighborhoods (variant count ≈ len^k — practical for k ≤ 2).
  *
  * Scale shape: |rows|·(len+1) variant rows shuffled once; per-variant
  * bucket sizes are the skew knob (a variant shared by m strings probes
  * m² candidate pairs — the LSH-bucket trade, same valve as
  * MinHashLSH.maxBucket if a corpus has pathological near-identical mass).
  * Verification is codegen'd levenshtein on the candidate set only.
  */
object FuzzyJoin {

  /** Unordered (id_a < id_b) pairs with levenshtein(str_a, str_b) ≤ 1,
    * with the distance. Ids must be unique; null/empty strings follow the
    * empty-string convention (an empty string pairs with single chars).
    */
  def editDistance1Pairs(df: DataFrame, idCol: String, strCol: String)
      : DataFrame = {
    // Spread the (id, str) projection to the session shuffle width BEFORE
    // the variant explode (guide §2.5 "input skew: repartition after the
    // read"): the corpus arrives as however many splits the scan produced
    // — for a small or unsplittable input that is ONE task, and the
    // explode + per-variant hashing (the compute-dense part: len+1
    // variants per row) serializes on one core (measured: the whole
    // pre-exchange pipeline of the q114 graph build ran 1.5 s in a
    // single task at sf0.1 on 32 cores). Hash-partitioning on the unique
    // id is balanced and avoids round-robin's sort-before-repartition;
    // the extra exchange moves only the raw (id, str) rows — ≤ 1/(len+1)
    // of the variant shuffle the join pays anyway, so the trade holds at
    // any scale, and the width follows spark.sql.shuffle.partitions.
    val width =
      try df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      catch { case _: Throwable => 200 }
    val base = df.select(col(idCol).as("__id"),
      coalesce(col(strCol), lit("")).as("__s"))
      .repartition(width, col("__id"))
    // {s} ∪ one-char deletions; sequence(1, 0) counts DOWN (the q100
    // hazard), so the empty string keeps only itself.
    val variants = base.withColumn("__del", explode(concat(
      array(col("__s")),
      when(length(col("__s")) > 0,
        expr("transform(sequence(1, length(__s)), i -> " +
          "concat(substr(__s, 1, i - 1), substr(__s, i + 1)))"))
        .otherwise(array().cast("array<string>")))))
    // Join on xxhash64(variant), not the variant string: the candidate
    // equi-join shuffles |rows|·(len+1) keys, and an 8-byte long beats a
    // name-length UTF8 key through the exchange (the MinHashLSH bucket-key
    // device; measured −6% on the q203 shape, SCALING.md fuzzy probe).
    // A hash collision only ADDS a candidate pair, which the exact
    // levenshtein verify below removes — the result set is unchanged.
    val hashed = variants.withColumn("__dh", xxhash64(col("__del")))
    val a = hashed.select(col("__id").as("id_a"), col("__s").as("str_a"),
      col("__dh"))
    val b = hashed.select(col("__id").as("id_b"), col("__s").as("str_b"),
      col("__dh"))
    a.join(b, Seq("__dh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("str_a"), col("str_b"))
      .distinct() // a pair can meet in several shared variants
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")).cast("long"))
      .filter(col("dist") <= 1)
  }
}
