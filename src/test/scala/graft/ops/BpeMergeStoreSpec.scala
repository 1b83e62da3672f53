package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The artifact-management half of the tokenizer lifecycle: merges
  * persist through the warehouse layout (PartitionedStore) and reload
  * into the EXACT trainer form — order from the `round` column, not
  * file order — and encoding from the loaded list reproduces the
  * trainer's final state verbatim (the BpeEncodeSpec equivalence, here
  * through a disk round-trip).
  */
class BpeMergeStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("load(save(merges)) == merges; encode from loaded == trainer state") {
    val words = Seq(("low", 5L), ("lower", 2L), ("lowest", 1L),
      ("newest", 6L), ("wider", 3L), ("news", 4L)).toDF("w", "cnt")
    val (merges, state) = BpeTrain.train(words, "w", "cnt", rounds = 4)
    assert(merges.size === 4)

    val dir = java.nio.file.Files.createTempDirectory("bpemerges").toString
    val artifact = BpeTrain.mergesDf(spark, merges)
      .withColumn("trained_at",
        lit("2026-08-16 00:00:00").cast("timestamp"))
    graft.sources.PartitionedStore.write(artifact, "trained_at",
      Seq("round"), dir)

    val loaded = BpeTrain.loadMerges(
      graft.sources.PartitionedStore.read(spark, dir))
    assert(loaded === merges)

    // encode(training corpus) with the LOADED merges == the trainer's
    // final positional state, word by word
    val fromState = state.select($"w", $"pos", $"sym")
      .as[(String, Long, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val encoded = words.select($"w",
        graft.functions.BpeFunctions.bpeEncode($"w",
          loaded.map(m => (m.symA, m.symB))).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(encoded === fromState)
  }

  test("empty merge list round-trips (schema pinned, no rows)") {
    // plain parquet here: a zero-row PARTITIONED write emits no data
    // files at all (nothing to carry the footer schema), so an empty
    // artifact must go through an unpartitioned write — worth pinning
    // as the caveat it is
    val dir = java.nio.file.Files.createTempDirectory("bpemerges0").toString
    BpeTrain.mergesDf(spark, Seq.empty)
      .write.mode("overwrite").parquet(dir)
    assert(BpeTrain.loadMerges(spark.read.parquet(dir)) === Seq.empty)
  }
}
