package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kline table-name fan-out matches the reference's unit spelling") {
    assert(Catalog.klineTableName("spot", "1m") === "bn_spot_klines_1min")
    assert(Catalog.klineTableName("perp", "1h") === "bn_perp_klines_1hour")
  }

  test("run log appends (now, status, comment) rows") {
    val dir = Files.createTempDirectory("graft_log").toString + "/log"
    Catalog.RunLog.append(spark, dir, "success", "updated 3 symbols")
    Catalog.RunLog.append(spark, dir, "failure", "ban until 123")
    val rows = Catalog.RunLog.read(spark, dir)
    assert(rows.count() === 2)
    assert(rows.columns.toSeq === Seq("timestamp", "status", "comment"))
    assert(rows.filter($"timestamp".isNull).isEmpty)
  }

  test("ensureTable is idempotent and queryable via SQL") {
    val loc = Files.createTempDirectory("graft_tbl").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(loc)
    Catalog.ensureTable(spark, "graft_t1", "id BIGINT, v STRING", loc)
    Catalog.ensureTable(spark, "graft_t1", "id BIGINT, v STRING", loc) // IF NOT EXISTS
    assert(spark.sql("SELECT count(*) FROM graft_t1").head.getLong(0) === 2L)
    spark.sql("DROP TABLE graft_t1")
  }

  test("pipeline config parses the reference's config.json shape with defaults") {
    val json = """{"bars": {"intervals": ["1m"], "start_date": "2020-01-01",
      "quote_assets": ["USDT"]},
      "rate_limits": {"spot_workers": 4, "futures_workers": 2,
      "update_interval_seconds": 600}}"""
    val c = PipelineConfig.fromJson(spark, json)
    assert(c.intervals === Seq("1m"))
    assert(c.startDate === "2020-01-01")
    assert(c.spotWorkers === 4)
    assert(c.updateIntervalSeconds === 600L)
    val d = PipelineConfig.fromJson(spark, """{"bars": {}}""")
    assert(d.intervals === PipelineConfig.default.intervals)
  }
}
