package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** SimHash near-duplicate detection (60-bit fingerprints, pigeonhole-blocked
  * Hamming join) — the constant-space sibling of [[MinHashLSH]] for the LLM
  * training-data dedup surface.
  *
  * Fingerprint: per bit j, sum +1/-1 over the document's distinct-token
  * 60-bit hashes according to that hash's bit j; fingerprint bit j is the
  * sign. Computed in ONE pass over the tokens via an array-of-counters fold
  * (`aggregate` + `zip_with`), not 60 passes.
  *
  * Candidate join: split the 60 bits into 4 × 15-bit chunks. Any pair within
  * Hamming distance ≤ 3 must agree on ≥ 1 whole chunk (pigeonhole), so
  * self-joining on (chunkIdx, chunkValue) is EXACT — same result set as the
  * O(n²) scan, but the shuffle is on chunk buckets. At 100 TB this is the
  * only viable shape; bucket skew (a very common chunk value) is the thing
  * to watch — AQE skew-join handles moderate cases; exact-duplicate groups
  * (identical fingerprints in every chunk) need
  * [[Dedup.collapseByContent]] first, exactly as with MinHashLSH.
  */
object SimHash {

  private val Bits = 60
  private val pow: Column = array((0 until Bits).map(j => lit(1L << j)): _*)

  /** 60-bit SimHash fingerprint of a token-array column (set semantics). */
  def fingerprint(tokens: Column): Column = {
    val th = transform(array_distinct(tokens), t => TF.hash60(t))
    val counts = aggregate(th, array_repeat(lit(0L), Bits),
      (acc, h) => zip_with(acc, pow,
        (a, p) => a + when(h.bitwiseAND(p) =!= 0, 1L).otherwise(-1L)))
    aggregate(zip_with(counts, pow, (c, p) => when(c > 0, p).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Collapse-first form: exact-duplicate groups (identical fingerprints in
    * every chunk) force C(g,2) bucket work — collapse to one representative
    * per distinct content, block on those, and return the membership map
    * (same contract as [[MinHashLSH.nearDuplicatesCollapsed]]).
    */
  def nearDuplicatesCollapsed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): (DataFrame, DataFrame) = {
    val (canonical, membership) = Dedup.collapseByContent(df, Seq(textCol), idCol)
    (nearDuplicates(canonical, idCol, textCol, maxHamming), membership)
  }

  /** All pairs with Hamming(fp_a, fp_b) ≤ maxHamming (requires ≤ 3 for the
    * 4-chunk blocking to stay exact). Output: doc_a, doc_b (a < b), hamming.
    *
    * `maxBucket` (0 = off) is the hot-chunk safety valve: a (chunk, value)
    * bucket holding g fingerprints emits C(g,2) join pairs in one task, and
    * a corpus with a massive exact-duplicate group concentrates that group
    * in the same bucket in EVERY chunk. Buckets above the cap are dropped
    * before the self-join, bounding any task at C(maxBucket,2). Recall
    * caveat when enabled (exactness holds only with the valve off): a pair
    * whose ONLY agreeing chunk is over cap is lost — pre-collapse exact
    * duplicates with [[Dedup.exactByContent]] first, the shape a 100 TB
    * pipeline wants anyway.
    */
  def nearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 0): DataFrame = {
    require(maxHamming <= 3, "4-chunk blocking is exact only for distance <= 3")
    // Compiled one-pass fingerprint (see HashExpressions); the HOF
    // [[fingerprint]] stays as the reference implementation. Repartition
    // first: small document files = one split = one core otherwise.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val fp = df.repartition(par).select(col(idCol).as("__id"),
      graft.functions.HashExpressions
        .simhashFingerprint(TF.tokens(col(textCol))).as("__fp"))

    val chunked = fp.select(col("__id"), col("__fp"),
      explode(array((0 until 4).map { i =>
        struct(lit(i).as("chunk"),
          shiftright(col("__fp"), i * 15).bitwiseAND(lit(0x7FFFL)).as("cval"))
      }: _*)).as("__c"))
      .select(col("__id"), col("__fp"), col("__c.chunk"), col("__c.cval"))

    val gated =
      if (maxBucket <= 0) chunked
      else chunked.withColumn("__bc",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("chunk"), col("cval"))))
        .filter(col("__bc") <= maxBucket)
        .drop("__bc")

    gated.as("x").join(gated.as("y"),
        col("x.chunk") === col("y.chunk") &&
        col("x.cval") === col("y.cval") &&
        col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("doc_a"), col("y.__id").as("doc_b"),
        bit_count(col("x.__fp").bitwiseXOR(col("y.__fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
