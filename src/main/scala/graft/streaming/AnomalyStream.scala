package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming z-score anomaly detection — the continuous form of
  * q86_zscore_outliers: per-key running moments held as managed streaming
  * state (Welford's algorithm: count/mean/M2 — O(1) state per key, no
  * sample buffer), each arriving value scored against the statistics of
  * everything that came BEFORE it.
  *
  * Determinism: within a batch, a key's rows are processed in (tsUs)
  * order and each row is scored against the state accumulated so far —
  * so as long as micro-batch boundaries respect event-time order per key
  * (the in-order-source case), a row's flag depends only on its
  * event-time prefix, NOT on how the stream was chopped. Late data is
  * scored against the state at arrival — the standard streaming trade;
  * bound it upstream with a watermark if late events must be dropped
  * instead. The spec pins batch-split invariance by feeding the same
  * ordered stream as one batch and as many, and the scoring itself
  * against an independent sequential reference.
  *
  * At scale: state is three doubles per key (cluster-fault-tolerant via
  * the state store); per-batch memory is one key's batch slice (sorted) —
  * the same bound any per-key stateful op pays. Keys are the
  * high-cardinality entity, so state shards across executors.
  */
object AnomalyStream {

  case class Reading(key: String, tsUs: Long, value: Double)
  case class MomentState(n: Long, mean: Double, m2: Double)
  case class Flag(key: String, tsUs: Long, value: Double,
                  z: Double, anomalous: Boolean)

  /** Welford fold + prior-prefix scoring. Rows with fewer than
    * `minSamples` prior observations (or zero variance) get z = 0, never
    * flagged.
    */
  def flags(readings: Dataset[Reading],
            zThreshold: Double = 3.0,
            minSamples: Long = 10): Dataset[Flag] = {
    import readings.sparkSession.implicits._
    readings.groupByKey(_.key)
      .flatMapGroupsWithState[MomentState, Flag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Reading], state: GroupState[MomentState]) =>
          var st = state.getOption.getOrElse(MomentState(0L, 0.0, 0.0))
          val out = rows.toSeq.sortBy(r => (r.tsUs, r.value)).map { r =>
            val sigma = if (st.n >= 2) math.sqrt(st.m2 / (st.n - 1)) else 0.0
            val scorable = st.n >= minSamples && sigma > 0
            val z = if (scorable) (r.value - st.mean) / sigma else 0.0
            val n1 = st.n + 1
            val d = r.value - st.mean
            val mean1 = st.mean + d / n1
            st = MomentState(n1, mean1, st.m2 + d * (r.value - mean1))
            Flag(key, r.tsUs, r.value, z, scorable && math.abs(z) > zThreshold)
          }
          state.update(st)
          out.iterator
      }
  }

  /** The same fold, sequentially, for reference/spec use. */
  def referenceFlags(rows: Seq[Reading], zThreshold: Double = 3.0,
                     minSamples: Long = 10): Seq[Flag] =
    rows.groupBy(_.key).toSeq.flatMap { case (key, rs) =>
      var st = MomentState(0L, 0.0, 0.0)
      rs.sortBy(r => (r.tsUs, r.value)).map { r =>
        val sigma = if (st.n >= 2) math.sqrt(st.m2 / (st.n - 1)) else 0.0
        val scorable = st.n >= minSamples && sigma > 0
        val z = if (scorable) (r.value - st.mean) / sigma else 0.0
        val n1 = st.n + 1
        val d = r.value - st.mean
        val mean1 = st.mean + d / n1
        st = MomentState(n1, mean1, st.m2 + d * (r.value - mean1))
        Flag(key, r.tsUs, r.value, z, scorable && math.abs(z) > zThreshold)
      }
    }
}
