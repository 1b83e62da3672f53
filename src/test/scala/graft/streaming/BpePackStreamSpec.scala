package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.TestSpark

/** Streaming tokenize→pack (q356's production path as a stream). Pins:
  *   - single-batch run ≡ the batch path exactly: full-corpus train →
  *     encode → SequencePack.pack, slice for slice;
  *   - multi-batch catch-up ≡ a batch pack over the per-arrival-order
  *     log with AS-OF token counts (each doc counted under the
  *     tokenizer of its arrival batch — the no-history-rewrite
  *     convention), including sequences straddling the batch boundary;
  *   - checkpointed catch-up across separate runs and replay-as-no-op
  *     (the 21-stream convention).
  */
class BpePackStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = true)))

  private val batch1 = Seq(
    (1L, "en", "low lower lowest low low"),
    (2L, "en", "new newer news new"),
    (3L, "de", "weit weiter weites"))
  private val batch2 = Seq(
    (4L, "en", "wider wide new lower"),
    (5L, "de", "weit weites neu"))

  private def wordsOf(rs: Seq[(Long, String, String)]) =
    rs.toDF("doc_id", "lang", "text")
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))

  private def ntoks(rs: Seq[(Long, String, String)],
                    merges: Seq[graft.ops.BpeTrain.Merge]) = {
    val m = merges.map(x => (x.symA, x.symB))
    rs.toDF("doc_id", "lang", "text")
      .select($"doc_id", $"lang",
        aggregate(graft.functions.TextFunctions.tokens($"text"), lit(0L),
          (acc, w) => acc +
            size(graft.functions.BpeFunctions.bpeEncode(w, m))
              .cast("long")).as("ntok"))
      .as[(Long, String, Long)].collect().toSeq
  }

  private def mkDirs(tag: String): (String, String, String, String, String) = {
    val root = java.nio.file.Files.createTempDirectory(tag).toString
    new java.io.File(s"$root/src").mkdirs()
    (s"$root/src", s"$root/store", s"$root/pack", s"$root/off",
      s"$root/ckpt")
  }

  private def land(src: String, rs: Seq[(Long, String, String)],
                   name: String): Unit = {
    val stage = s"$src/../stage_$name"
    rs.toDF("doc_id", "lang", "text").coalesce(1).write.parquet(stage)
    new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$src/$name.parquet")))
  }

  private def run(src: String, store: String, pack: String, off: String,
                  ckpt: String, seqLen: Long): Unit = {
    val q = BpeStream.startEncodePack(spark, src, schema, "doc_id", "text",
      "lang", store, pack, off, ckpt, rounds = 3, seqLen = seqLen)
    q.awaitTermination()
  }

  private def slicesOf(pack: String) =
    BpeStream.packedSlices(spark, pack)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet

  private def batchPack(docTok: Seq[(Long, String, Long)], seqLen: Long) =
    graft.ops.SequencePack.pack(
        docTok.toDF("doc_id", "lang", "ntok").select($"lang", $"doc_id", $"ntok"),
        Seq("lang"), Seq("doc_id"), "ntok", seqLen)
      .select($"lang", $"doc_id", $"ntok", $"seq_id",
        $"doc_tok_start", $"seq_tok_start", $"n_tok")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet

  test("single batch: streamed pack == batch train->encode->pack") {
    val (src, store, pack, off, ckpt) = mkDirs("bpepack1")
    land(src, batch1 ++ batch2, "all")
    run(src, store, pack, off, ckpt, seqLen = 4L)
    val (full, _) = graft.ops.BpeTrain.train(
      wordsOf(batch1 ++ batch2), "w", "cnt", rounds = 3)
    assert(slicesOf(pack) === batchPack(ntoks(batch1 ++ batch2, full), 4L))
  }

  test("catch-up batches: as-of token counts, boundary-straddling seqs, replay no-op") {
    val (src, store, pack, off, ckpt) = mkDirs("bpepack2")
    land(src, batch1, "b1")
    run(src, store, pack, off, ckpt, seqLen = 4L)
    land(src, batch2, "b2")
    run(src, store, pack, off, ckpt, seqLen = 4L)

    // reference: batch pack over the arrival-ordered log where each
    // doc's token count comes from ITS batch's tokenizer
    val (m1, _) = graft.ops.BpeTrain.train(wordsOf(batch1), "w", "cnt", 3)
    val (m2, _) = graft.ops.BpeTrain.train(
      wordsOf(batch1 ++ batch2), "w", "cnt", 3)
    assert(m1 !== m2, "as-of pin must not be vacuous")
    val asOf = ntoks(batch1, m1) ++ ntoks(batch2, m2)
    val got = slicesOf(pack)
    assert(got === batchPack(asOf, 4L))
    // at least one sequence straddles the batch boundary: some seq_id
    // present in both a batch-1 doc's slices and a batch-2 doc's
    val b1Ids = batch1.map(_._1).toSet
    val seqsB1 = got.filter(s => b1Ids.contains(s._2)).map(s => (s._1, s._4))
    val seqsB2 = got.filterNot(s => b1Ids.contains(s._2)).map(s => (s._1, s._4))
    assert(seqsB1.intersect(seqsB2).nonEmpty,
      "fixture should produce a boundary-straddling sequence")

    // replay with no new files: pack and offset stores unchanged
    val packRows = spark.read.parquet(pack).count()
    val offRows = spark.read.parquet(off).count()
    run(src, store, pack, off, ckpt, seqLen = 4L)
    assert(spark.read.parquet(pack).count() === packRows)
    assert(spark.read.parquet(off).count() === offRows)
    assert(slicesOf(pack) === got)
  }
}
