package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.util.QueryExecutionListener

/** RUNTIME scan counting — the measured form of the round-8 plan-text scan
  * audit. The text audit (`ScaleProbe` `scans` mode) counts `*.parquet`
  * occurrences in `executedPlan.toString`, which over-counts two ways:
  * persist-backed internals print their build lineage under
  * `InMemoryRelation` although consumers read cached blocks, and reused
  * exchanges/subqueries print the reused subtree. Both needed manual triage
  * (SCALING.md round-8 "Remaining 45 flags"). This module counts what
  * actually EXECUTED instead.
  *
  * [[measuredScans]] is the full-fidelity form: it opens a
  * [[QueryExecutionListener]] window around query CONSTRUCTION plus final
  * materialization, so every tracked action inside the query function —
  * `localCheckpoint` pin builds (Dataset.checkpoint goes through
  * withAction), bounded `.count()`/`.collect()` bookkeeping, cache-building
  * first consumers — contributes its executed plan's scans. That closes the
  * blind spot the text audit shares: a pinned subtree's build scans vanish
  * from the final plan but are real corpus passes per materialization.
  *
  * Per executed plan, [[scansOf]] walks the post-execution adaptive plan
  * (`AdaptiveSparkPlanExec.executedPlan`), query stages, and per-node
  * subqueries, visiting each node INSTANCE once (identity set) so
  * `ReusedExchangeExec`/`ReusedSubqueryExec` — which point at the original
  * node — add nothing; an `InMemoryTableScanExec` descends into its cache's
  * build plan once per CACHE (cacheBuilder identity, shared across the
  * whole listener window), and a `FileSourceScanExec` counts only if its
  * `numFiles` metric says it actually opened files.
  */
object ScanAudit {

  val tables: Seq[String] = Seq("documents", "embeddings", "lineitem",
    "orders", "customer", "supplier", "part", "nation", "region", "events")

  /** Build the query inside a listener window, materialize it fully, and
    * return executed parquet-scan counts per base table — INCLUDING scans
    * run by checkpoint pins, cache builds, and driver-side bounded
    * bookkeeping during construction. This is "corpus passes per
    * materialization", measured.
    */
  def measuredScans(spark: SparkSession)(build: => DataFrame): Map[String, Int] = {
    val lock = new Object
    val seen = newIdentitySet()
    val acc = mutable.Map.empty[String, Int].withDefaultValue(0)
    def add(p: SparkPlan): Unit = lock.synchronized {
      scansInto(p, seen, acc)
    }
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        if (sys.env.get("SPARK_GRAFT_SCAN_DEBUG").contains("1"))
          System.err.println(s"[scan-qe] onSuccess func=$funcName qe@" +
            Integer.toHexString(System.identityHashCode(qe)))
        add(qe.executedPlan)
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val qe = build.queryExecution
      // drain THIS QueryExecution (df.write would plan and run a separate
      // one, leaving these plan nodes' metrics at zero)
      spark.sparkContext.runJob(qe.toRdd,
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =>
          { while (it.hasNext) it.next(); () })
      org.apache.spark.GraftSparkInternals.drainListenerBus(spark.sparkContext)
      if (sys.env.get("SPARK_GRAFT_SCAN_DEBUG").contains("2"))
        System.err.println(qe.executedPlan.toString)
      add(qe.executedPlan)
      lock.synchronized(acc.toMap)
    } finally spark.listenerManager.unregister(listener)
  }

  /** Executed-scan counts per base table of one already-run plan (no
    * listener window: checkpoint builds from construction are not seen).
    */
  def scansOf(root: SparkPlan): Map[String, Int] = {
    val acc = mutable.Map.empty[String, Int].withDefaultValue(0)
    scansInto(root, newIdentitySet(), acc)
    acc.toMap
  }

  private def newIdentitySet(): java.util.Set[AnyRef] =
    java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())

  private def scansInto(root: SparkPlan, visited: java.util.Set[AnyRef],
                        counts: mutable.Map[String, Int]): Unit = {
    def walk(p: SparkPlan): Unit = {
      if (!visited.add(p)) return
      p.subqueries.foreach(walk)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec => walk(qs.plan)
        case r: ReusedExchangeExec => walk(r.child) // identity set dedupes
        case c: InMemoryTableScanExec =>
          if (visited.add(c.relation.cacheBuilder)) walk(c.relation.cachedPlan)
        case s: FileSourceScanExec =>
          val opened = s.metrics.get("numFiles").map(_.value).getOrElse(0L)
          if (opened > 0) tableOf(s).foreach { t =>
            counts(t) += 1
            // per-scan provenance for triaging WHICH split re-executed
            if (sys.env.get("SPARK_GRAFT_SCAN_DEBUG").contains("1"))
              System.err.println(s"[scan] $t rows=" +
                s"${s.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)}" +
                s" filters=${s.dataFilters.mkString(";")}")
          }
        case other => other.children.foreach(walk)
      }
    }
    walk(root)
  }

  private def tableOf(s: FileSourceScanExec): Option[String] = {
    val paths = s.relation.location.rootPaths.mkString(";")
    tables.find(t => paths.contains(s"$t.parquet"))
  }
}
