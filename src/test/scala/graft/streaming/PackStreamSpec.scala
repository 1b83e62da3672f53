package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Streaming sequence packing: slices emitted across micro-batches and
  * checkpointed restarts must be bit-identical to a from-scratch batch
  * `SequencePack.pack` over the same log, for every order-respecting
  * batch split — including splits that land mid-sequence (the running
  * offset in state is the whole point).
  */
class PackStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val SeqLen = 100L

  private type SliceT = (String, Long, Long, Long, Long, Long, Long)

  /** The batch engine's answer on the same frame. */
  private def batchPack(rows: Seq[PackStream.Doc]): Set[SliceT] = {
    import org.apache.spark.sql.functions.col
    graft.ops.SequencePack.pack(
        rows.toDF("lang", "docId", "ntok"),
        groupCols = Seq("lang"), orderCols = Seq("docId"),
        tokenCol = "ntok", seqLen = SeqLen)
      .select(col("lang"), col("docId"), col("ntok"), col("seq_id"),
        col("doc_tok_start"), col("seq_tok_start"), col("n_tok"))
      .as[SliceT].collect().toSet
  }

  /** Land the log in `nBatches` order-respecting chunks; each landing
    * runs AvailableNow against the same checkpoint — a restart per batch.
    */
  private def driveBatches(rows: Seq[PackStream.Doc], nBatches: Int)
      : Set[SliceT] = {
    val root = Files.createTempDirectory(s"pack_$nBatches").toString
    val src = s"$root/src"; new java.io.File(src).mkdirs()
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[SliceT]()
    def runOnce(): Unit = {
      val docs = spark.readStream
        .schema(Seq(PackStream.Doc("x", 0L, 0L)).toDS().schema)
        .parquet(src)
        .as[PackStream.Doc]
      val q = PackStream.updates(docs, SeqLen).writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[PackStream.Slice], _: Long) =>
            b.collect().foreach(s => got.add((s.lang, s.docId, s.ntok,
              s.seqId, s.docTokStart, s.seqTokStart, s.sliceTok)))
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    rows.grouped(math.ceil(rows.size.toDouble / nBatches).toInt)
      .zipWithIndex.foreach { case (b, i) =>
        val stage = s"$root/stage_$i"
        b.toDS().coalesce(1).write.parquet(stage)
        new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .foreach(f => Files.move(f.toPath,
            java.nio.file.Paths.get(s"$src/b$i.parquet")))
        runOnce()
      }
    import scala.jdk.CollectionConverters._
    got.asScala.toSet
  }

  private def fixture(seed: Int, n: Int): Seq[PackStream.Doc] = {
    val rnd = new scala.util.Random(seed)
    val langs = Seq("en", "de", "fr")
    (1 to n).map { i =>
      // lengths straddle sequences: some short, some multi-sequence,
      // the occasional empty doc (the q64 zero-width-slice convention)
      val ntok = rnd.nextInt(8) match {
        case 0 => 0L
        case 7 => 150L + rnd.nextInt(300).toLong
        case _ => 1L + rnd.nextInt(60).toLong
      }
      PackStream.Doc(langs(rnd.nextInt(langs.size)), i.toLong, ntok)
    }
  }

  test("streamed slices equal batch pack at 1, 3 and 5 batch splits") {
    val rows = fixture(13, 120)
    val expect = batchPack(rows)
    Seq(1, 3, 5).foreach { nb =>
      assert(driveBatches(rows, nb) === expect, s"split=$nb")
    }
  }

  test("a split landing mid-sequence continues the same sequence") {
    // lang 'en' only, lengths chosen so the batch boundary after doc 2
    // sits at offset 130 — mid-sequence 1 and ALSO mid-doc-3's span:
    // the next batch must resume at seq 1, offset 30, not restart at 0
    val rows = Seq(
      PackStream.Doc("en", 1L, 70L),   // seq 0
      PackStream.Doc("en", 2L, 60L),   // seqs 0-1, ends at 130
      PackStream.Doc("en", 3L, 250L),  // seqs 1-3
      PackStream.Doc("en", 4L, 20L))   // seq 3
    val expect = batchPack(rows)
    assert(driveBatches(rows, 2) === expect)
    // and the invariant the state exists for: doc 3's first slice starts
    // at seq_tok_start 30 of seq 1 (130 mod 100), carried across restart
    val d3 = driveBatches(rows, 2).filter(s => s._2 == 3L && s._4 == 1L)
    assert(d3.map(s => s._6) === Set(30L))
  }

  test("zero-token docs emit one zero-width slice at the current offset") {
    val rows = Seq(
      PackStream.Doc("en", 1L, 40L),
      PackStream.Doc("en", 2L, 0L),
      PackStream.Doc("en", 3L, 40L))
    val got = driveBatches(rows, 3)
    assert(got === batchPack(rows))
    val z = got.filter(_._2 == 2L)
    assert(z.size === 1 && z.head._7 === 0L && z.head._6 === 40L)
  }
}
