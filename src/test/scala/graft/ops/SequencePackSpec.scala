package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Sequence packing must tile each group's token stream exactly: slices
  * cover every document without gap or overlap, every sequence except a
  * group's last is exactly seqLen tokens, and the whole assignment matches
  * a straightforward single-threaded packer.
  */
class SequencePackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class Slice(group: String, doc: Long, ntok: Long, seq: Long,
                           docStart: Long, seqStart: Long, n: Long)

  /** Single-threaded reference: walk docs in (group, doc) order, cut the
    * concatenated stream every seqLen tokens.
    */
  private def reference(docs: Seq[(String, Long, Long)],
                        seqLen: Long): Set[Slice] =
    docs.groupBy(_._1).flatMap { case (g, ds) =>
      var off = 0L
      ds.sortBy(_._2).flatMap { case (_, id, ntok) =>
        val start = off
        off += ntok
        if (ntok == 0)
          Seq(Slice(g, id, 0, start / seqLen, 0, start % seqLen, 0))
        else {
          val first = start / seqLen
          val last = (start + ntok - 1) / seqLen
          (first to last).map { s =>
            val lo = math.max(start, s * seqLen)
            val hi = math.min(start + ntok, (s + 1) * seqLen)
            Slice(g, id, ntok, s, lo - start, lo - s * seqLen, hi - lo)
          }
        }
      }
    }.toSet

  private def run(docs: Seq[(String, Long, Long)], seqLen: Long): Set[Slice] =
    SequencePack.pack(
        docs.toDF("g", "doc_id", "ntok").repartition(5),
        groupCols = Seq("g"), orderCols = Seq("doc_id"),
        tokenCol = "ntok", seqLen = seqLen, partitions = 4)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(t => Slice(t._1, t._2, t._3, t._4, t._5, t._6, t._7)).toSet

  test("matches the single-threaded packer on a randomized corpus") {
    val rnd = new scala.util.Random(64)
    val docs = (1L to 400L).map { id =>
      ("lang" + (id % 3), id, rnd.nextInt(50).toLong)
    }
    assert(run(docs, seqLen = 37) === reference(docs, seqLen = 37))
  }

  test("docs spanning many sequences and empty docs") {
    val docs = Seq(
      ("g", 1L, 250L),  // spans sequences 0..2 at L=100
      ("g", 2L, 0L),    // empty doc: one zero-length slice at offset 250
      ("g", 3L, 50L),   // fills sequence 2 to its boundary
      ("g", 4L, 100L))  // exactly sequences 3..3
    val out = run(docs, seqLen = 100)
    assert(out === reference(docs, seqLen = 100))
    // doc 1: three slices of 100/100/50; doc 4 starts exactly at a boundary
    assert(out.filter(_.doc == 1).map(s => (s.seq, s.n)) ===
      Set((0L, 100L), (1L, 100L), (2L, 50L)))
    assert(out.filter(_.doc == 4) === Set(Slice("g", 4, 100, 3, 0, 0, 100)))
  }

  test("every sequence except the group's last is exactly seqLen") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 300L).map { id =>
      ("s" + (id % 2), id, (1 + rnd.nextInt(90)).toLong)
    }
    val l = 64L
    val bySeq = run(docs, l).groupBy(s => (s.group, s.seq))
      .view.mapValues(_.toSeq.map(_.n).sum).toMap
    bySeq.groupBy(_._1._1).foreach { case (g, seqs) =>
      val maxSeq = seqs.keys.map(_._2).max
      seqs.foreach { case ((_, s), tot) =>
        if (s < maxSeq) assert(tot === l, s"group $g sequence $s not full")
        else assert(tot <= l)
      }
    }
  }
}
