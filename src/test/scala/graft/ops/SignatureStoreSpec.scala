package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Incremental near-dup against a persisted signature store: a new batch
  * dedups against the old corpus WITHOUT re-reading old text — the hourly
  * refetch-loop shape. Pins parquet round-trip of the projection, the
  * exclusion of old×old pairs, equivalence with the full-corpus pass
  * restricted to batch-touching pairs, and cross-batch grouping.
  */
class SignatureStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val batch1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "completely different words about spark engines and parquet files"),
    (3L, "tokyo weather report sunny with a chance of rain tomorrow evening")
  ).toDF("doc_id", "text")

  private lazy val batch2 = Seq(
    (10L, "the quick brown fox jumps over the lazy dog again and again"),   // exact re-delivery of 1
    (11L, "the quick brown fox jumps over the lazy cat again and again"),   // mutation of 1
    (12L, "unrelated fresh content mentioning neither foxes nor engines today"),
    (13L, "tokyo weather report sunny with a chance of rain tomorrow evening soon"),    // near-dup of 3
    (14L, "tokyo weather report sunny with a chance of rain tomorrow evening soon ok")  // near-dup of 13, within batch
  ).toDF("doc_id", "text")

  test("incremental pairs vs a parquet round-tripped store: re-delivered, mutated, within-batch; no old pairs re-emitted") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore").toString
    SignatureStore.signatures(batch1, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val store = spark.read.parquet(dir)
    val sigs2 = SignatureStore.signatures(batch2, "doc_id", "text")
    val pairs = SignatureStore.incrementalPairs(store, sigs2, threshold = 0.3)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    // exact re-delivery: jaccard exactly 1
    assert(pairs.find(p => p._1 == 1L && p._2 == 10L).exists(_._3 == 1.0))
    assert(keys.contains((1L, 11L)), "mutated doc must pair with its old original")
    assert(keys.contains((3L, 13L)), "cross-batch near-dup")
    assert(keys.contains((13L, 14L)), "within-batch near-dup")
    assert(!keys.exists(p => p._1 <= 3L && p._2 <= 3L), "old×old must never re-emit")
    assert(!keys.exists(p => p._1 == 12L || p._2 == 12L), "unrelated doc in no pair")
  }

  test("incremental pairs == full-corpus nearDuplicates restricted to batch-touching pairs") {
    val full = MinHashLSH.nearDuplicates(
        batch1.unionByName(batch2), "doc_id", "text", threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val batchIds = Set(10L, 11L, 12L, 13L, 14L)
    val expected = full.filter(p => batchIds(p._1) || batchIds(p._2))
    val inc = SignatureStore.incrementalPairs(
        SignatureStore.signatures(batch1, "doc_id", "text"),
        SignatureStore.signatures(batch2, "doc_id", "text"), threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc === expected)
  }

  test("cross-batch components: original, re-delivered and mutated docs share a group") {
    val p1 = MinHashLSH.nearDuplicates(batch1, "doc_id", "text", threshold = 0.3)
      .select($"doc_a", $"doc_b")
    val inc = SignatureStore.incrementalPairs(
        SignatureStore.signatures(batch1, "doc_id", "text"),
        SignatureStore.signatures(batch2, "doc_id", "text"), threshold = 0.3)
      .select($"doc_a", $"doc_b")
    val comp = ConnectedComponents.run(p1.unionByName(inc), "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(comp(1L) == comp(10L) && comp(1L) == comp(11L))
    assert(comp(3L) == comp(13L) && comp(13L) == comp(14L))
  }
}
