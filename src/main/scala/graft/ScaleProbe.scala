package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: measures the duplicate-group pathology and its fix on
  * any dataset dir — naive banded LSH over the raw corpus vs
  * collapse-exact-dups-first ([[graft.ops.MinHashLSH.nearDuplicatesCollapsed]]).
  * A corpus whose documents repeat g× forces g² bucket work on ANY blocked
  * near-dup pass (identical content collides in every band); collapsing
  * first restores the distinct-corpus cost. Prints one JSON line.
  *
  *   SPARK_GRAFT_SF_DIR=<dir> tools/run.sh graft.ScaleProbe
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    new java.io.File("/dev/shm/spark-local").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PART", "256k"))
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    // warm JIT/codegen on a small slice so the first timed pass isn't
    // paying cold-start (it biased the naive number ~1.8× high)
    graft.ops.MinHashLSH.nearDuplicates(docs.limit(200), "doc_id", "text")
      .write.format("noop").mode("overwrite").save()
    val naive = time {
      graft.ops.MinHashLSH.nearDuplicates(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    val collapsed = time {
      val (pairs, membership) = graft.ops.MinHashLSH
        .nearDuplicatesCollapsed(docs, "doc_id", "text")
      pairs.write.format("noop").mode("overwrite").save()
      membership.write.format("noop").mode("overwrite").save()
    }
    val exactCollapsed = time {
      val (pairs, membership) = graft.ops.MinHashLSH
        .exactNearDuplicatesCollapsed(docs, "doc_id", "text")
      pairs.write.format("noop").mode("overwrite").save()
      membership.write.format("noop").mode("overwrite").save()
    }
    println(s"""{"metric":"dup_collapse_probe","docs":$nDocs,""" +
      s""""naive_sec":$naive,"collapsed_sec":$collapsed,""" +
      s""""exact_collapsed_sec":$exactCollapsed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
