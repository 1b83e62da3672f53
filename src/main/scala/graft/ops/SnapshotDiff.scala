package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level delta between two keyed snapshots of a table — the CDC /
  * "what changed since the last ingest" primitive behind incremental
  * publishing, cache invalidation, and re-train triggers (which shards of a
  * 100 TB corpus need re-tokenizing after a refetch?).
  *
  * Classification per key: `added` (new only), `removed` (old only),
  * `changed` (both, payload fingerprint differs), `unchanged`.
  *
  * Shape at 100 TB:
  *   - each side is projected to (keys, 128-bit payload fingerprint) BEFORE
  *     the join — the full-outer shuffle carries ~48 bytes/row regardless of
  *     row width; wide payloads never cross the exchange.
  *   - one sort-merge full-outer join on the key columns; no collect, no
  *     window. If both snapshots are bucketed/partitioned on the key on
  *     disk, storage-partitioned join elides the shuffle entirely.
  *   - the fingerprint is `md5(to_json(struct(payload columns, sorted by
  *     name)))` — canonical column order, engine-deterministic rendering;
  *     equal fingerprints ⇔ equal rendered payloads (hash-collision odds
  *     2^-128, the standard CDC trade).
  */
object SnapshotDiff {

  /** Delta rows: key columns + `status`. Payload = all non-key columns
    * (must match across snapshots, any order).
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String]): DataFrame = {
    def payload(df: DataFrame): Seq[String] =
      df.columns.filterNot(keys.contains).sorted.toSeq
    require(payload(oldSnap) == payload(newSnap),
      s"snapshot payload columns differ: ${payload(oldSnap)} vs ${payload(newSnap)}")

    def fingerprinted(df: DataFrame, hcol: String): DataFrame =
      df.select(keys.map(col) :+
        md5(to_json(struct(payload(df).map(col): _*))).as(hcol): _*)

    fingerprinted(oldSnap, "__h_old")
      .join(fingerprinted(newSnap, "__h_new"), keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") =!= col("__h_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"): _*)
  }
}
