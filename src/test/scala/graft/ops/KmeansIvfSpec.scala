package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The trained IVF quantizer must (a) actually separate separable data,
  * (b) make partial probes exact when the true neighbors share a cell, and
  * (c) be deterministic (no seed-sensitive sampling in the plan).
  */
class KmeansIvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 3 well-separated direction clusters in 6-dim: cluster c points mostly
    * along axis 2c with small deterministic jitter on axis 2c+1.
    */
  private lazy val fixture = {
    val rows = for {
      c <- 0 until 3
      i <- 0 until 40
    } yield {
      val v = Array.fill(6)(0.0f)
      v(2 * c) = 1.0f
      v(2 * c + 1) = 0.05f * ((i % 7) - 3)   // jitter, deterministic
      (c.toLong * 100 + i, v.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "true_cluster").repartition(4)
  }

  test("k-means separates well-separated clusters into distinct cells") {
    val cents = Knn.kmeansCentroids(fixture, "embedding", k = 3, iters = 4)
    assert(cents.length === 3)
    val assigned = Knn.kmeansAssign(fixture, "embedding", cents)
    // every generated cluster lands in exactly one cell, and different
    // clusters land in different cells
    val cellsPerCluster = assigned.groupBy($"true_cluster")
      .agg(org.apache.spark.sql.functions.collect_set($"cell").as("cells"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    assert(cellsPerCluster.values.forall(_.size === 1),
      s"cluster split across cells: $cellsPerCluster")
    assert(cellsPerCluster.values.map(_.head).toSet.size === 3,
      s"clusters merged into one cell: $cellsPerCluster")
  }

  test("partial probe (nProbe=1) is exact when neighbors share a cell") {
    // query along axis 0 = inside cluster 0; its top-10 lives there too
    val query = Seq(1.0, 0.02, 0.0, 0.0, 0.0, 0.0)
    val pruned = Knn.ivfTopKTrained(spark, fixture, "vec_id", "embedding",
      query, k = 10, kCells = 3, nProbe = 1, iters = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = Knn.topKByCosine(fixture, "vec_id", "embedding", query, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pruned.toSeq === brute.toSeq)
  }

  test("probing all cells equals brute force regardless of training") {
    val query = Seq(0.1, 0.9, 0.2, 0.0, 0.1, 0.0)   // off-center query
    val all = Knn.ivfTopKTrained(spark, fixture, "vec_id", "embedding",
      query, k = 15, kCells = 3, nProbe = 3, iters = 1)  // barely trained
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = Knn.topKByCosine(fixture, "vec_id", "embedding", query, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(all.toSeq === brute.toSeq)
  }

  test("training is deterministic run-to-run") {
    val a = Knn.kmeansCentroids(fixture, "embedding", k = 3, iters = 3)
    val b = Knn.kmeansCentroids(fixture, "embedding", k = 3, iters = 3)
    assert(a === b)
  }

  test("cell-partitioned layout: IVF probes become partition pruning at rest") {
    // The 100 TB claim in SCALING.md, executed end-to-end: train → stamp
    // cell ids → write partitionBy(cell) → probe = a filter that Spark's
    // file index answers by NOT READING the other cells' files.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/emb"
    val cents = Knn.kmeansCentroids(fixture, "embedding", k = 3, iters = 4)
    Knn.kmeansAssign(fixture, "embedding", cents)
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val atRest = spark.read.parquet(dir)

    // probe the cell nearest to a cluster-0 query (same selection ivfTopK
    // makes), then scan only it
    val query = Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val probedCell = cents.zipWithIndex.maxBy { case (c, _) =>
      val dot = c.head  // cosine vs e0 ∝ first coordinate / norm
      dot / math.sqrt(c.map(x => x * x).sum)
    }._2
    val pruned = atRest.filter($"cell" === probedCell)
    // the filter lands as a PARTITION filter (file-index pruning, not a
    // data filter): the scan never opens the other cells' files
    pruned.collect()
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("cell"),
      planStr.take(2000))
    val others = (0 until 3).filter(_ != probedCell)
    others.foreach(c => assert(!planStr.contains(s"cell=$c"), planStr.take(2000)))
    assert(pruned.count() === 40)  // exactly one generated cluster
    // and the pruned scan still answers the query exactly (vs brute force
    // over the full fixture restricted to that cell's 40 vectors)
    val topIds = Knn.topKByCosine(pruned, "vec_id", "embedding", query, 10)
      .select($"vec_id").as[Long].collect().toSet
    val bruteIds = Knn.topKByCosine(fixture, "vec_id", "embedding", query, 10)
      .select($"vec_id").as[Long].collect().toSet
    assert(topIds === bruteIds)
  }

  test("sampled training (trainFraction < 1) still separates the clusters") {
    val cents = Knn.kmeansCentroids(fixture, "embedding", k = 3, iters = 4,
      trainFraction = 0.5)
    assert(cents.length === 3)
    val assigned = Knn.kmeansAssign(fixture, "embedding", cents)
    val cellsPerCluster = assigned.groupBy($"true_cluster")
      .agg(org.apache.spark.sql.functions.collect_set($"cell").as("cells"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    assert(cellsPerCluster.values.forall(_.size === 1), s"$cellsPerCluster")
    assert(cellsPerCluster.values.map(_.head).toSet.size === 3, s"$cellsPerCluster")
  }

  test("empty cells keep their previous centroid") {
    // k larger than the number of distinct directions: some cells go empty
    val cents = Knn.kmeansCentroids(fixture, "embedding", k = 5, iters = 3)
    assert(cents.length <= 5 && cents.nonEmpty)
    cents.foreach(c => assert(c.length === 6))
  }
}
