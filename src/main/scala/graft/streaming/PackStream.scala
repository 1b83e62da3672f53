package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — q64's incremental form: documents arrive
  * on an append-only log and must land in fixed-length training
  * sequences AS THEY ARRIVE, without re-running the corpus prefix sum
  * (the batch q64 shape) over everything seen so far. The per-group
  * state is ONE long — the running token offset — exactly the quantity
  * q64's distributed prefix sum computes per row; everything else
  * (sequence span, slice geometry) is arithmetic on that offset, so the
  * streamed slices are bit-identical to a batch `SequencePack.pack`
  * over the same log.
  *
  * Invariance contract (DebounceStream's, stated the same way): the fold
  * equals the batch pack for every ORDER-RESPECTING batching of the
  * per-group stream — append-only log semantics; within a batch rows are
  * sorted by docId before folding. Packing is order-SENSITIVE (each
  * doc's sequence span depends on every earlier doc's length), which is
  * exactly why the offset must live in managed state rather than be
  * recomputed: a restart that replayed the log would shift every
  * subsequent slice.
  *
  * Scale shape: state is |groups| × 1 long; each micro-batch shuffles
  * only its own rows by group; emission is one row per (doc, sequence)
  * slice — the same output contract as q64. The in-batch sort is
  * bounded by per-group batch activity. Geometry mirrors
  * `ops/SequencePack.pack` exactly, including the zero-token-doc
  * convention (`greatest(ntok, 1)` span, zero-width slice).
  */
object PackStream {

  case class Doc(lang: String, docId: Long, ntok: Long)

  case class PackState(cum: Long)

  case class Slice(lang: String, docId: Long, ntok: Long, seqId: Long,
                   docTokStart: Long, seqTokStart: Long, sliceTok: Long)

  def updates(docs: Dataset[Doc], seqLen: Long): Dataset[Slice] = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState[PackState, Slice](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[Doc], state: GroupState[PackState]) =>
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = Seq.newBuilder[Slice]
          rows.toSeq.sortBy(_.docId).foreach { d =>
            val start = cum
            val first = Math.floorDiv(start, seqLen)
            val last =
              Math.floorDiv(start + math.max(d.ntok, 1L) - 1L, seqLen)
            var q = first
            while (q <= last) {
              val lo = math.max(start, q * seqLen)
              val hi = math.min(start + d.ntok, (q + 1) * seqLen)
              out += Slice(lang, d.docId, d.ntok, q,
                lo - start, lo - q * seqLen, hi - lo)
              q += 1
            }
            cum += d.ntok
          }
          state.update(PackState(cum))
          out.result().iterator
      }
  }
}
