package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — the arbitrary
  * per-key state surface (SURVEY.md §2.10 T3: the reference keeps a per-
  * symbol resume cursor in progress.json, `crypto_data_pipeline_clickhouse
  * .py:289,317-322`; here the engine keeps it as managed streaming state).
  *
  * Emits one row per (key, batch) with the running max timestamp and the
  * running row count — exactly the "where do I resume this symbol" record —
  * while Spark owns fault-tolerant state storage and watermark-based
  * cleanup at cluster scale.
  */
object StatefulCursor {

  case class Tick(key: String, tsUs: Long)
  case class CursorState(maxTsUs: Long, count: Long)
  case class CursorUpdate(key: String, watermarkUs: Long, totalRows: Long)

  def updates(ticks: Dataset[Tick]): Dataset[CursorUpdate] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.key)
      .flatMapGroupsWithState[CursorState, CursorUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Tick], state: GroupState[CursorState]) =>
          val prev = state.getOption.getOrElse(CursorState(Long.MinValue, 0L))
          var maxTs = prev.maxTsUs
          var n = prev.count
          rows.foreach { t =>
            if (t.tsUs > maxTs) maxTs = t.tsUs
            n += 1
          }
          state.update(CursorState(maxTs, n))
          Iterator(CursorUpdate(key, maxTs, n))
      }
  }
}
