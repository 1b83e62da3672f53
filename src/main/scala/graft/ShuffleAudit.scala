package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** RUNTIME shuffle / spill accounting — the sequel to [[ScanAudit]]: the
  * scan audit measures how many times a query re-reads the corpus; this
  * measures how many bytes it MOVES once read. At 100 TB the two together
  * are the cost model: corpus passes × scan bytes + shuffle bytes (every
  * shuffled byte is serialized, written, fetched and deserialized across
  * the cluster fabric), and any spill at test scale (128 GiB heap, sf0.1)
  * is an OOM forecast at 1000-executor scale.
  *
  * Same window discipline as [[ScanAudit.measuredScans]]: a
  * [[SparkListener]] is registered around query construction plus final
  * materialization, so checkpoint-pin builds, cache builds and bounded
  * bookkeeping actions all contribute their tasks' metrics. Metrics are
  * summed from `onTaskEnd` (the only place executor-side task metrics are
  * complete), and the listener bus is drained before reading.
  *
  * What each number means for the 100 TB argument:
  *  - `inputBytes`   — bytes SOURCED into tasks: parquet reads (compressed,
  *    post column-pruning) PLUS block-manager reads of cached / pinned
  *    intermediates (Spark credits a task's cached-block reads to
  *    inputMetrics too — measured: q181 k-core reads its lineitem parquet
  *    exactly once per the scan audit, yet shows in=190 MB at sf0.1, the
  *    cumulative per-round block reads of its checkpointed peel state).
  *    Parquet-only passes are [[ScanAudit]]'s domain; this number is the
  *    total byte traffic a query's tasks pull from storage+cache.
  *  - `shuffleWrite` — bytes written to shuffle files across ALL stages of
  *    the query (map-side, post partial-aggregation). The headline cost:
  *    a query whose shuffleWrite ≫ input is re-materializing the corpus
  *    over the network instead of reducing early.
  *  - `memSpill`/`diskSpill` — bytes spilled by sorts/aggregations. ZERO
  *    is the bar at sf0.1: partitions that spill in a 128 GiB single-node
  *    heap are sized wrong for executors with 8–32 GiB.
  *  - `peakTaskMem` — max per-task peak execution memory. ×32 concurrent
  *    tasks approximates the working set; a query whose peak×cores rivals
  *    the heap is one skewed partition away from spilling.
  *
  * Interpretation caveat baked into the flag rule: input bytes are
  * COMPRESSED parquet (plus cached-block reads) while shuffle bytes are
  * serialized rows (lz4-framed but row-oriented), so ratios of 1–3× are
  * normal for shuffle-an-entire-projection plans, and explode-heavy
  * shapes over the tiny dictionary-compressed test corpus legitimately
  * show 1000× ratios on KB inputs. The audit therefore flags (a) any
  * spill, and (b) shuffleWrite > `ratioMax` × input AND above an absolute
  * floor — absolute shuffle bytes, not the ratio, is what multiplies to
  * a fabric bill at 100 TB.
  */
object ShuffleAudit {

  final case class Stats(inputBytes: Long, shuffleWrite: Long,
                         shuffleRead: Long, memSpill: Long, diskSpill: Long,
                         peakTaskMem: Long, tasks: Long) {
    def ratio: Double = shuffleWrite.toDouble / math.max(inputBytes, 1L).toDouble
    def pretty: String =
      f"in=${mb(inputBytes)}%s shW=${mb(shuffleWrite)}%s shR=${mb(shuffleRead)}%s " +
        f"ratio=$ratio%.2f spillMem=${mb(memSpill)}%s spillDisk=${mb(diskSpill)}%s " +
        f"peakTask=${mb(peakTaskMem)}%s tasks=$tasks%d"
    private def mb(b: Long): String =
      if (b >= 10L * 1024 * 1024) f"${b / (1024.0 * 1024.0)}%.0fM"
      else if (b >= 1024) f"${b / 1024.0}%.0fK" else s"${b}B"
  }

  /** Build the query inside a listener window, materialize it fully, and
    * return task-metric totals — including tasks run by checkpoint pins,
    * cache builds and bounded driver-side bookkeeping during construction.
    */
  def measured(spark: SparkSession)(build: => DataFrame): Stats = {
    val in = new AtomicLong; val sw = new AtomicLong; val sr = new AtomicLong
    val ms = new AtomicLong; val ds = new AtomicLong; val pk = new AtomicLong
    val nt = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          in.addAndGet(m.inputMetrics.bytesRead)
          sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          ms.addAndGet(m.memoryBytesSpilled)
          ds.addAndGet(m.diskBytesSpilled)
          pk.accumulateAndGet(m.peakExecutionMemory, math.max(_, _))
          nt.incrementAndGet()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val qe = build.queryExecution
      spark.sparkContext.runJob(qe.toRdd,
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =>
          { while (it.hasNext) it.next(); () })
      org.apache.spark.GraftSparkInternals.drainListenerBus(spark.sparkContext)
      Stats(in.get, sw.get, sr.get, ms.get, ds.get, pk.get, nt.get)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
