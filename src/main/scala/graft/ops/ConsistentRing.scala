package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Consistent-hash vnode ring (Dynamo/Cassandra-style), as bounded CONFIG:
  * `nShards` × `nVnodes` points hashed onto the 60-bit ring through the
  * same `hash60` column function the DuckDB oracle replays, then collected
  * driver-side (≤ 144 rows — the Knn-centroid bookkeeping convention).
  *
  * The successor lookup ("first ring point clockwise from the key's hash")
  * is naively a range join — a BroadcastNestedLoopJoin, banned by PlanSpec.
  * [[routingTable]] turns it into a broadcast EQUI-join: the ring is cut
  * into 256 equal buckets (2^60 / 2^52); each bucket lists its resident
  * points plus the first point PAST the bucket (ring wrap encoded as
  * pt + 2^60, so `pt > kh` stays one monotone predicate), and the key side
  * joins on `kh div 2^52` then takes min-by-pt among `pt > kh`. Shared by
  * q213 (static ring) and q328 (resize move matrix — two tables tagged by
  * ring id).
  */
object ConsistentRing {

  /** 2^60 ring / 256 buckets. */
  val BucketWidth: Long = 1L << 52

  /** The raw ring: (shard, point) sorted by point. */
  def ringPoints(s: SparkSession, nShards: Int,
                 nVnodes: Int = 16): Seq[(Long, Long)] = {
    val ringDf = s.range(0, nShards).toDF("sh")
      .crossJoin(broadcast(s.range(0, nVnodes.toLong).toDF("vn")))
      .select(col("sh"), TF.hash60(concat(lit("ring:s"), col("sh"),
        lit(":v"), col("vn"))).as("pt"))
    ringDf.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._2).toSeq
  }

  /** 256-bucket routing rows (bucket, pt, sh) — resident points of each
    * bucket plus its successor, wrap as pt + 2^60.
    */
  def routingTable(s: SparkSession, nShards: Int,
                   nVnodes: Int = 16): Seq[(Long, Long, Long)] = {
    val ring = ringPoints(s, nShards, nVnodes)
    val minPt = ring.head
    (0 until 256).flatMap { b =>
      val inBucket = ring.filter(p => p._2 >> 52 == b)
        .map(p => (b.toLong, p._2, p._1))
      val succ = ring.find(_._2 > (b + 1) * BucketWidth - 1)
        .map(p => (b.toLong, p._2, p._1))
        .getOrElse((b.toLong, minPt._2 + (1L << 60), minPt._1))
      inBucket :+ succ
    }
  }
}
