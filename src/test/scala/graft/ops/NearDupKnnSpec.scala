package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.{TextFunctions => TF}

/** Near-dup (MinHash-LSH, SimHash) and similarity-search (kNN/IVF) specs. */
class NearDupKnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("minhash-lsh finds exact and near duplicates, skips unrelated") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),    // exact dup
      (3L, "the quick brown fox jumps over the lazy cat again and again"),    // near dup
      (4L, "completely different words about spark engines and parquet files")
    ).toDF("doc_id", "text")
    val out = MinHashLSH.nearDuplicates(docs, "doc_id", "text",
        w = 3, k = 64, rowsPerBand = 2, threshold = 0.5)
      .orderBy("doc_a", "doc_b")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(out.contains((1L, 2L)))
    assert(out.contains((1L, 3L)) && out.contains((2L, 3L)))
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L))
    // exact dup pair has jaccard exactly 1.0
    val j12 = MinHashLSH.nearDuplicates(docs, "doc_id", "text")
      .filter($"doc_a" === 1 && $"doc_b" === 2).select("jaccard").head.getDouble(0)
    assert(j12 === 1.0)
  }

  test("simhash: identical token sets -> hamming 0; blocked join matches brute force") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "theta eta zeta epsilon delta gamma beta alpha"),  // same set, hamming 0
      (3L, "unrelated vocabulary entirely separate cluster tokens here now")
    ).toDF("doc_id", "text")
    val pairs = SimHash.nearDuplicates(docs, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 0)))

    // blocked candidate join == brute-force pairwise on the fingerprints
    val fp = docs.select($"doc_id",
      SimHash.fingerprint(TF.tokens($"text")).as("fp"))
    val brute = fp.as("a").join(fp.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id",
        bit_count($"a.fp".bitwiseXOR($"b.fp")).as("h"))
      .filter($"h" <= 3).count()
    assert(brute === pairs.size.toLong)
  }

  test("srp-lsh candidates catch all planted near-dup embedding pairs") {
    val rng = new scala.util.Random(7)
    // 30 base vectors, each duplicated with tiny noise -> 30 planted pairs
    val base = (0 until 30).map(i => Array.fill(16)(rng.nextFloat() * 2 - 1))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong * 2, v.toSeq),
          (i.toLong * 2 + 1, v.map(x => x + rng.nextFloat() * 0.01f).toSeq))
    }.toDF("vec_id", "embedding")
    val cands = Knn.srpCandidatePairs(rows, "vec_id", "embedding",
        nPlanes = 48, rowsPerBand = 8)
      .as[(Long, Long)].collect().toSet
    (0 until 30).foreach { i =>
      assert(cands.contains((i.toLong * 2, i.toLong * 2 + 1)), s"pair $i missed")
    }
    // verify-after-block: exact cosine confirms the planted pairs
    val exact = Knn.nearDuplicatePairs(rows, "vec_id", "embedding", 0.999)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    (0 until 30).foreach { i =>
      assert(exact.contains((i.toLong * 2, i.toLong * 2 + 1)))
    }
  }

  test("srpIncrementalPairs: batch-touching pairs only; store×store never re-emitted") {
    val base = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(1f, 0f, 0f, 0f)),            // store-internal exact dup of 1
      (4L, Seq(0f, 0f, 1f, 0f)))
    val store = base.toDF("vec_id", "embedding")
    val batch = Seq(
      (10L, Seq(1f, 0f, 0f, 0f)),           // dup of store 1 and 3 (and batch 11)
      (11L, Seq(1f, 0f, 0f, 0f)),           // dup of the same family
      (12L, Seq(0f, 0f, 0f, 1f)))           // genuinely new
      .toDF("vec_id", "embedding")
    val out = Knn.srpIncrementalPairs(batch, store,
        "vec_id", "embedding", threshold = 0.95)
      .select($"new_id", $"dup_id").as[(Long, Long)].collect().toSet
    // batch×store pairs, plus the batch×batch pair exactly once (id order);
    // the store-internal (1,3) dup is ABSENT — already known to the store
    assert(out === Set((10L, 1L), (10L, 3L), (11L, 1L), (11L, 3L),
      (10L, 11L)))
  }

  test("batch topKJoin agrees with per-query brute-force topK") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val joined = Knn.topKJoin(emb.filter($"vec_id" < 5), emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 7)
      .select($"query_id", $"vec_id", $"cos")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(t => (-t._3, t._2)).map(r => (r._2, r._3)).toSeq).toMap
    (0L until 5L).foreach { q =>
      val query = emb.filter($"vec_id" === q).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble)
      val single = Knn.topKByCosine(emb, "vec_id", "embedding", query, 7)
        .as[(Long, Double)].collect().toSeq
      assert(joined(q) === single, s"query $q")
    }
  }

  test("sharded topKJoin (shard smaller than Q) is identical to unsharded") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 11)   // 11 queries, shards of 4
    def rows(maxShard: Int) =
      Knn.topKJoin(queries, emb, "vec_id", "embedding", "vec_id", "embedding",
          k = 6, maxShardQueries = maxShard)
        .select($"query_id", $"vec_id", $"cos")
        .as[(Long, Long, Double)].collect().sortBy(t => (t._1, -t._3, t._2)).toSeq
    assert(rows(4) === rows(0))
  }

  test("topKJoin fails loud past maxDriverQueries, naming cellTopKJoin; at the bound it works") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 11)   // 11 queries
    val ex = intercept[IllegalArgumentException] {
      Knn.topKJoin(queries, emb, "vec_id", "embedding", "vec_id", "embedding",
        k = 3, maxDriverQueries = 10)
    }
    assert(ex.getMessage.contains("cellTopKJoin"))
    assert(ex.getMessage.contains("maxDriverQueries=10"))
    // exactly at the bound: normal result, same as the unbounded default
    def rows(maxQ: Int) =
      Knn.topKJoin(queries, emb, "vec_id", "embedding", "vec_id", "embedding",
          k = 3, maxDriverQueries = maxQ)
        .select($"query_id", $"vec_id", $"cos")
        .as[(Long, Long, Double)].collect().sortBy(t => (t._1, -t._3, t._2)).toSeq
    assert(rows(11) === rows(1 << 20))
  }

  test("cellTopKJoin with all cells probed is identical to topKJoin; query side never collected") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 9)
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"vec_id", $"cos")
      .as[(Long, Long, Double)].collect().sortBy(t => (t._1, -t._3, t._2)).toSeq
    val viaCells = norm(Knn.cellTopKJoin(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding",
      k = 6, kCells = 4, nProbe = 4, iters = 2, splits = 3))
    val viaBroadcast = norm(Knn.topKJoin(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 6))
    assert(viaCells === viaBroadcast)

    // splits=1 (no salt replication) must not change the pair set either
    val unsplit = norm(Knn.cellTopKJoin(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding",
      k = 6, kCells = 4, nProbe = 4, iters = 2, splits = 1))
    assert(unsplit === viaBroadcast)

    // partial probes: every returned neighbor must still be genuine (a
    // subset of the brute-force candidates can only lower recall, never
    // invent pairs) and per-query results keep the (cos desc, id) order
    val partial = Knn.cellTopKJoin(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding",
      k = 6, kCells = 4, nProbe = 2, iters = 2)
      .select($"query_id", $"vec_id", $"cos")
      .as[(Long, Long, Double)].collect().toSeq
    val bruteAll = viaBroadcast.toSet
    val bruteByQ = viaBroadcast.groupBy(_._1)
    partial.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.size <= 6)
      // each partial hit at least matches some corpus vector exactly as
      // brute force scored it when it made the top-k; others are valid
      // lower-cos candidates — all must score <= the brute top-1
      val bestBrute = bruteByQ(q).map(_._3).max
      assert(rows.forall(_._3 <= bestBrute + 1e-9))
    }
    assert(partial.count(bruteAll.contains) > 0)
  }

  test("cellTopKJoin property: random vectors, random geometry — always identical to topKJoin at full probes") {
    (0 until 3).foreach { seed =>
      val rng = new scala.util.Random(100 + seed)
      val n = 40 + rng.nextInt(30)
      val dim = 6 + rng.nextInt(6)
      val emb = (0 until n).map(i =>
        (i.toLong, Seq.fill(dim)(rng.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
      val queries = emb.filter($"vec_id" % 7 === 0)
      val k = 1 + rng.nextInt(5)
      val kCells = 2 + rng.nextInt(4)
      val splits = 1 + rng.nextInt(4)
      def norm(df: org.apache.spark.sql.DataFrame) = df
        .select($"query_id", $"vec_id", $"cos")
        .as[(Long, Long, Double)].collect().sortBy(t => (t._1, -t._3, t._2)).toSeq
      val cells = norm(Knn.cellTopKJoin(queries, emb,
        "vec_id", "embedding", "vec_id", "embedding",
        k = k, kCells = kCells, nProbe = kCells, iters = 2, splits = splits))
      val brute = norm(Knn.topKJoin(queries, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = k))
      assert(cells === brute, s"seed=$seed n=$n dim=$dim k=$k kCells=$kCells splits=$splits")
    }
  }

  test("ivf with all cells probed == brute force; 1 probe recovers a clustered query") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val query = emb.filter($"vec_id" === 1).select("embedding")
      .head.getSeq[Float](0).map(_.toDouble)
    val nCells = emb.select(countDistinct("label")).head.getLong(0).toInt
    val brute = Knn.topKByCosine(emb, "vec_id", "embedding", query, 10)
      .select("vec_id").as[Long].collect().toSeq
    val ivfAll = Knn.ivfTopK(spark, emb, "vec_id", "embedding", "label",
      query, 10, nProbe = nCells).select("vec_id").as[Long].collect().toSeq
    assert(ivfAll === brute)

    // Clustered vectors with labels = true cells: one probe must recover the
    // full neighborhood (the testdata labels are NOT geometric, so the real
    // recall story needs a real quantizer; this asserts the mechanism).
    val rng = new scala.util.Random(42)
    val clustered = (0 until 90).map { i =>
      val cell = i % 3
      val base = Array.tabulate(8)(d => if (d == cell) 10.0f else 0.0f)
      (i.toLong, base.map(v => v + rng.nextFloat() * 0.1f).toSeq, cell)
    }.toDF("vec_id", "embedding", "label")
    val cq = (0 until 8).map(d => if (d == 1) 10.0 else 0.0)
    val bruteC = Knn.topKByCosine(clustered, "vec_id", "embedding", cq, 5)
      .select("vec_id").as[Long].collect().toSeq
    val ivf1 = Knn.ivfTopK(spark, clustered, "vec_id", "embedding", "label",
      cq, 5, nProbe = 1).select("vec_id").as[Long].collect().toSeq
    assert(ivf1 === bruteC)
  }
}
