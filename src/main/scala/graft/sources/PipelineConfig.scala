package graft.sources

/** Typed pipeline configuration — the reference's `config.json` surface
  * (S10: `crypto_data_pipeline_clickhouse.py:35-41`, `config.json:1-36`).
  * Drives which tables/intervals the engine materializes; parsed from the
  * same JSON shape with zero dependencies (driver-side, tiny).
  */
final case class PipelineConfig(
    intervals: Seq[String],
    startDate: String,
    quoteAssets: Seq[String],
    spotWorkers: Int,
    futuresWorkers: Int,
    updateIntervalSeconds: Long)

object PipelineConfig {

  val default: PipelineConfig = PipelineConfig(
    intervals = Seq("1m", "1h"),
    startDate = "2017-01-01",
    quoteAssets = Seq("USDT", "USDC"),
    spotWorkers = 10,
    futuresWorkers = 6,
    updateIntervalSeconds = 3600L)

  /** Parse the reference's config.json shape via Spark's JSON reader (one
    * tiny driver-side frame; keeps the parser consistent with the engine).
    */
  def fromJson(spark: org.apache.spark.sql.SparkSession, json: String): PipelineConfig = {
    import spark.implicits._
    // the JSON source is line-delimited; config files are small → flatten
    val df = spark.read.json(Seq(json.replaceAll("\\s*\\n\\s*", " ")).toDS())
    def opt[T](f: => T, fallback: T): T = scala.util.Try(f).getOrElse(fallback)
    val row = df.head()
    def nested(path: String*): Option[org.apache.spark.sql.Row] =
      path.foldLeft(Option(row)) { (r, f) =>
        r.flatMap(rr => opt(Option(rr.getAs[org.apache.spark.sql.Row](f)), None))
      }
    val bars = nested("bars")
    val rate = nested("rate_limits")
    // Row-held arrays are mutable.ArraySeq in 2.13 — widen then .toSeq
    def strs(r: org.apache.spark.sql.Row, f: String): Seq[String] =
      r.getAs[scala.collection.Seq[String]](f).toSeq
    PipelineConfig(
      intervals = bars.map(b => opt(strs(b, "intervals"), default.intervals))
        .getOrElse(default.intervals),
      startDate = bars.map(b => opt(b.getAs[String]("start_date"), default.startDate))
        .getOrElse(default.startDate),
      quoteAssets = bars.map(b => opt(strs(b, "quote_assets"), default.quoteAssets))
        .getOrElse(default.quoteAssets),
      spotWorkers = rate.map(r => opt(r.getAs[Long]("spot_workers").toInt, default.spotWorkers))
        .getOrElse(default.spotWorkers),
      futuresWorkers = rate.map(r => opt(r.getAs[Long]("futures_workers").toInt, default.futuresWorkers))
        .getOrElse(default.futuresWorkers),
      updateIntervalSeconds = rate.map(r =>
        opt(r.getAs[Long]("update_interval_seconds"), default.updateIntervalSeconds))
        .getOrElse(default.updateIntervalSeconds))
  }
}
