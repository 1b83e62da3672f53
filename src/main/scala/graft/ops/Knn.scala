package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Similarity search over an embedding column (`array<float>`) — the ANN
  * surface of the LLM-data-pipeline north star (BASELINE.json).
  *
  * Two tiers:
  *  - [[topKByCosine]] — exact brute-force scan; the correctness baseline.
  *    One pass, no shuffle (TakeOrderedAndProject keeps only k rows per
  *    partition then merges on the driver).
  *  - [[ivfTopK]] — inverted-file ANN: vectors are pre-bucketed by a coarse
  *    quantizer cell (here the `label` column stands in for a k-means cell
  *    id; at 100 TB you'd train centroids once and store the cell id at
  *    ingest, making cells partition keys). Query probes only the nProbe
  *    cells whose centroids are nearest — a partition-pruned scan reading
  *    nProbe/|cells| of the data.
  */
object Knn {

  /** Exact top-k by cosine against a constant query vector.
    * Scores rounded to 6 dp with id tie-break so the ordering is total.
    */
  def topKByCosine(
      emb: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame =
    emb.select(col(idCol),
        round(VF.cosineToQuery(VF.toDouble(col(vecCol)), query), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)

  /** Embedding-cosine near-duplicate pairs, exact: all ordered pairs with
    * cosine ≥ threshold (compiled [[graft.functions.HashExpressions.CosineSim]]
    * — the interpreted HOF dot product is ~100× slower inside an all-pairs
    * join). Quadratic by definition; the scale path is [[srpCandidatePairs]].
    */
  def nearDuplicatePairs(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    // fan the streamed side across cores — a single-split table would put
    // all O(n²) cosine work in one task
    val par = emb.sparkSession.sparkContext.defaultParallelism
    val a = emb.repartition(par).select(col(idCol).as("vec_a"), col(vecCol).as("__va"))
    val b = emb.select(col(idCol).as("vec_b"), col(vecCol).as("__vb"))
    val cos = round(
      graft.functions.HashExpressions.cosineSim(col("__va"), col("__vb")), 6)
    // threshold INSIDE the join condition: the nested-loop join then emits
    // only qualifying pairs instead of materializing all O(n²) wide rows
    a.join(b, col("vec_a") < col("vec_b") && cos >= threshold)
      .withColumn("cos", cos)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** SRP-LSH candidate pairs: vectors sharing at least one `rowsPerBand`-bit
    * chunk of their signed-random-projection signature. Candidates estimate
    * high-cosine pairs; callers re-verify exactly (same verify-after-block
    * shape as MinHashLSH). Shuffles only (chunk, value) buckets — the
    * 100 TB-safe alternative to the quadratic [[nearDuplicatePairs]].
    */
  def srpCandidatePairs(
      emb: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int = 48, rowsPerBand: Int = 8): DataFrame = {
    val bands = nPlanes / rowsPerBand
    val mask = (1L << rowsPerBand) - 1
    val sig = emb.select(col(idCol).as("__id"),
      graft.functions.HashExpressions.srpSignature(col(vecCol), nPlanes).as("__sig"))
    val chunked = sig.select(col("__id"),
      explode(array((0 until bands).map { i =>
        struct(lit(i).as("chunk"),
          shiftright(col("__sig"), i * rowsPerBand).bitwiseAND(lit(mask)).as("cval"))
      }: _*)).as("__c"))
      .select(col("__id"), col("__c.chunk"), col("__c.cval"))
    chunked.as("x").join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") &&
        col("x.cval") === col("y.cval") &&
        col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("vec_a"), col("y.__id").as("vec_b"))
      .distinct()
  }

  /** Per-cell centroids (elementwise mean of vectors). Output: cell, centroid. */
  def centroids(emb: DataFrame, cellCol: String, vecCol: String): DataFrame =
    emb.select(col(cellCol).as("cell"),
        posexplode(VF.toDouble(col(vecCol))).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos")).agg(avg(col("v")).as("m"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** IVF ANN: rank cells by centroid cosine, scan only the top `nProbe`
    * cells, exact top-k within them. The probed-cell selection is a tiny
    * aggregate (|cells| rows) collected to the driver — the same role a
    * broadcast dimension plays in the reference's star schema.
    */
  def ivfTopK(
      spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
      cellCol: String, query: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val cents = centroids(emb, cellCol, vecCol)
    val probed: Array[Any] = cents
      .select(col("cell"),
        VF.cosineToQuery(col("centroid"), query).as("c"))
      .orderBy(col("c").desc, col("cell").asc)
      .limit(nProbe)
      .collect().map(_.get(0))
    topKByCosine(
      emb.filter(col(cellCol).isin(probed.toSeq: _*)), idCol, vecCol, query, k)
  }
}
