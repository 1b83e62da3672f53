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
