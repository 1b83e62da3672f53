package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** External columnar-database sink — the K2 surface of SURVEY.md §2: the
  * reference bulk-loads pandas frames into ClickHouse with one columnar
  * INSERT per cached file (`/root/reference/app/src/utils_clickhouse.py:46-57`,
  * `client.execute(INSERT ... VALUES, columnar=True)`). Spark's native
  * analog is the JDBC batch writer: each partition opens one connection and
  * streams `batchsize`-row executeBatch calls — the same
  * "few large inserts, never row-at-a-time" discipline the reference's
  * loader enforces (`crypto_data_pipeline_clickhouse.py:638-659`).
  *
  * Scale shape (1000-executor cluster, 100 TB):
  *  - `numPartitions` caps CONCURRENT CONNECTIONS, not parallelism of the
  *    upstream plan — Spark coalesces right before the write, so a 10k-task
  *    pipeline funnels into e.g. 32 writer connections without reshuffling.
  *    Size it to what the target DB's ingest path tolerates (the reference
  *    serializes on one client; a warehouse endpoint takes tens).
  *  - `batchSize` is the rows-per-executeBatch (columnar-insert analog);
  *    10k-100k amortizes round trips without blowing executor heap.
  *  - `isolationLevel=NONE` skips transactional bookkeeping for append-only
  *    fact loads (the reference's tables are append-mostly MergeTree).
  *  - `truncate=true` turns overwrite into TRUNCATE+INSERT, preserving the
  *    target's DDL (codecs, sort keys) instead of DROP+CREATE from Spark's
  *    inferred schema — essential when the DBA owns the table definition.
  *
  * CLICKHOUSE MAPPING LIMITS (what this sink does and does not reproduce):
  *  - No `columnar=True` analog: the native ClickHouse protocol ships whole
  *    column blocks; JDBC ships row batches. Same few-large-inserts
  *    discipline, lower wire efficiency — if a ClickHouse JDBC driver is on
  *    the classpath its batched INSERT still server-side-converts to column
  *    parts, so the storage outcome is identical.
  *  - No ReplacingMergeTree: the reference leans on the ENGINE to collapse
  *    re-fetched duplicates at merge time (`utils_clickhouse.py` DDL,
  *    ORDER BY key + version column). Over JDBC the target is a plain
  *    table, so dedup is this engine's job: upsert = append the overlap,
  *    then keep-last on read ([[readDeduped]], same semantics as ClickHouse
  *    `SELECT ... FINAL`) — or merge before shipping
  *    ([[graft.streaming.IncrementalIngest.upsertBatch]]) so the warehouse
  *    only ever sees collapsed rows.
  *  - At-least-once, not exactly-once: a retried writer task may re-append
  *    its batch (Spark JDBC has no transactional sink). Harmless under the
  *    keep-last read, the same way the reference tolerates re-fetch overlap.
  */
object JdbcSink {

  final case class Config(
      url: String,
      table: String,
      batchSize: Int = 10000,
      numPartitions: Option[Int] = None,
      isolationLevel: String = "READ_UNCOMMITTED",
      truncate: Boolean = false,
      driver: Option[String] = None,
      options: Map[String, String] = Map.empty)

  /** Bulk-append/overwrite `df` into `cfg.table`. */
  def write(df: DataFrame, cfg: Config, mode: SaveMode = SaveMode.Append): Unit = {
    require(cfg.batchSize > 0, s"batchSize must be positive, got ${cfg.batchSize}")
    // coalesce (not repartition): capping connections must not add a shuffle
    val capped = cfg.numPartitions.fold(df)(n => df.coalesce(n))
    val writer = capped.write.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("batchsize", cfg.batchSize.toString)
      .option("isolationLevel", cfg.isolationLevel)
      .option("truncate", cfg.truncate.toString)
    val withDriver = cfg.driver.fold(writer)(d => writer.option("driver", d))
    cfg.options.foldLeft(withDriver) { case (w, (k, v)) => w.option(k, v) }
      .mode(mode)
      .save()
  }

  /** Read the table back collapsed to the latest version per key — the
    * JDBC-side analog of ClickHouse `SELECT ... FINAL` over a
    * ReplacingMergeTree: appended re-fetches/retries dedup away here
    * instead of at engine merge time.
    */
  def readDeduped(spark: SparkSession, cfg: Config,
                  keys: Seq[String], version: Seq[String]): DataFrame =
    graft.ops.Dedup.keepLast(read(spark, cfg), keys, version)

  /** Read the table back (round-trip verification / dimension reload). */
  def read(spark: SparkSession, cfg: Config): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
    val withDriver = cfg.driver.fold(reader)(d => reader.option("driver", d))
    cfg.options.foldLeft(withDriver) { case (r, (k, v)) => r.option(k, v) }
      .load()
  }
}
