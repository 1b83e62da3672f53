package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** The maintained kNN graph must be the EXACT top-k cosine graph over
  * every vector seen so far — a deterministic function of the vector SET,
  * so streamed (any batching) ≡ one-shot rebuild is literal equality.
  * Includes an exact-duplicate clique: the case where the self pair can
  * rank below k and naive "ask k, drop self" loses a true neighbor.
  */
class KnnGraphStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("vec_id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("embedding",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType), nullable = true)))

  // 12 vectors: a 5-strong exact-duplicate clique (ids 1-5), a near cluster,
  // an orthogonal pair, and a lone axis
  private val vectors: Seq[(Long, Seq[Float])] = Seq(
    1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(1f, 0f, 0f, 0f),
    3L -> Seq(1f, 0f, 0f, 0f), 4L -> Seq(1f, 0f, 0f, 0f),
    5L -> Seq(1f, 0f, 0f, 0f),
    6L -> Seq(0.9f, 0.1f, 0f, 0f), 7L -> Seq(0.8f, 0.2f, 0f, 0f),
    8L -> Seq(0f, 1f, 0f, 0f), 9L -> Seq(0f, 0.9f, 0.1f, 0f),
    10L -> Seq(0f, 0f, 1f, 0f), 11L -> Seq(0f, 0f, 0.9f, 0.3f),
    12L -> Seq(0f, 0f, 0f, 1f))

  private def df(vs: Seq[(Long, Seq[Float])]) = vs.toDF("vec_id", "embedding")

  private def edges(g: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    g.select($"qa", $"cb", $"cos").as[(Long, Long, Double)].collect().toSet

  test("streamed graph over 3 checkpointed catch-up runs == one-shot rebuild; replay is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("knngraph").toString
    val src = s"$root/src"; val store = s"$root/store"
    val graph = s"$root/graph"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    def land(vs: Seq[(Long, Seq[Float])], name: String): Unit = {
      val stage = s"$root/stage_$name"
      df(vs).coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/$name.parquet")))
    }
    def run(): Unit = {
      val q = KnnGraphStream.start(spark, src, schema, "vec_id", "embedding",
        store, graph, ckpt, Trigger.AvailableNow(), k = 3, kCells = 2)
      q.awaitTermination()
    }

    val (b1, rest) = vectors.splitAt(5)   // the whole dup clique first
    val (b2, b3) = rest.splitAt(3)
    land(b1, "b1"); run()
    land(b2, "b2"); run()
    land(b3, "b3"); run()

    val streamed = edges(spark.read.parquet(graph))
    val rebuilt = edges(KnnGraphStream.rebuild(
      df(vectors), "vec_id", "embedding", k = 3, kCells = 2))
    assert(streamed === rebuilt)
    assert(spark.read.parquet(store).count() === vectors.size.toLong)

    // every vector has exactly k=3 neighbors (11 candidates each), and the
    // dup clique's neighbors are clique members at cos 1.0
    val g = spark.read.parquet(graph)
    assert(g.groupBy($"qa").count().filter($"count" =!= 3).isEmpty)
    assert(streamed.filter(e => e._1 == 1L).forall(e =>
      Set(2L, 3L, 4L).contains(e._2) && e._3 == 1.0))

    // at-least-once replay: re-processing an already-landed batch must
    // change neither the graph nor the store
    KnnGraphStream.processBatch(spark, df(b3), "vec_id", "embedding",
      store, graph, k = 3, kCells = 2)
    assert(edges(spark.read.parquet(graph)) === streamed)
    assert(spark.read.parquet(store).count() === vectors.size.toLong)
  }

  test("batching invariance: 1-batch and 2-batch landings produce the identical graph") {
    def streamedWith(splits: Seq[Seq[(Long, Seq[Float])]]): Set[(Long, Long, Double)] = {
      val root = java.nio.file.Files.createTempDirectory("knngraph2").toString
      val store = s"$root/store"; val graph = s"$root/graph"
      splits.foreach(b => KnnGraphStream.processBatch(spark, df(b),
        "vec_id", "embedding", store, graph, k = 3, kCells = 2))
      edges(spark.read.parquet(graph))
    }
    val one = streamedWith(Seq(vectors))
    val two = streamedWith(Seq(vectors.take(7), vectors.drop(7)))
    assert(one === two)
  }
}
