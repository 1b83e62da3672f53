package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  * Queries are fully materialized through the `noop` sink (a bare `count()`
  * would let Catalyst prune most of the work).
  *
  * Per-query value convention: the reported seconds for each query is the
  * MINIMUM over SPARK_GRAFT_BENCH_REPS passes (default 3) — this host has
  * bursty noisy-neighbor stalls, and the min is the only statistic that
  * estimates the plan rather than the neighbor. Committed records go one
  * step further: back-to-back full runs are folded per query via
  * SPARK_GRAFT_BENCH_MERGE=<prev.json> — each query's value becomes the
  * min across ALL merged runs' mins (never "the per-query values of the
  * best-total run", which inherits that one window's bursts), `total` is
  * the sum of merged mins, and `merged_runs` counts the folded runs.
  * Merging refuses records from a different sf or query set, refuses
  * contended inputs (loadavg-flagged), and refuses to fold when the
  * CURRENT run is itself contended — so a loaded window can't donate
  * values to a quiet record from either side. A refused merge is an
  * explicit fact, not a stderr note: the emitted JSON carries
  * `merge_skipped_reason` so automated flows can tell "no merge
  * requested" (null) from "merge requested and refused" (a string).
  *
  * File convention (round-10 postmortem: a contended driver run
  * overwrote the committed quiet record in place):
  *   - `BENCH_round.json` — ALWAYS written on a full run, the
  *     run-as-executed per-round artifact, contended or not;
  *   - `BENCH_LOCAL.json` — the quiet gate artifact, written ONLY when
  *     this run is quiet (not loadavg-flagged) AND any requested merge
  *     actually folded. A contended or merge-refused run leaves the
  *     committed record untouched.
  *   - an explicit SPARK_GRAFT_BENCH_OUT overrides the gate path and is
  *     written unconditionally (targeted profiling to a scratch file).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle/spill on tmpfs: this VM's disk has multi-second write stalls
    // that made identical runs swing 5-10x; RAM-backed local dirs remove it.
    new java.io.File("/dev/shm/spark-local").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Compute-dense stages (pair generation, LSH verify, tiled cosine)
      // shuffle KBs at test SF; AQE's default 1 MB minPartitionSize floor
      // coalesces them below the core count and serializes the compute.
      // 256k measured best across the 4- and 32-core profiles (64k splinters
      // light stages into scheduling overhead at 32 threads; 1 MB starves
      // 4 cores). At real SF (MB-GB shuffles) the floor is inert either way.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PART", "256k"))
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up on the smoke scale: JIT, codegen, and FS metadata once, so the
    // per-query numbers below measure the plans, not cold-start overhead.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    // Per-query minimum over `reps` passes: this VM shows bursty
    // noisy-neighbor stalls (identical runs swing 3-5x, and round 2's
    // driver run ate a 20x spike on one query); 3 reps by default so a
    // single stalled pass can't own the headline, and the per-rep times
    // ship in the JSON ("reps_sec") so a noisy rep is visible post-hoc.
    // System load context (1/5/15-min loadavg) stamped at start and end of
    // the run: driver-window benches on this VM are often heavily contended
    // (round 7: 10-17x tails on a dozen queries vs the quiet exclusive run),
    // and the record should carry its own load evidence rather than need a
    // manual calibration note against a separate quiet rerun.
    def loadavg(): String =
      try {
        val s = scala.io.Source.fromFile("/proc/loadavg")
        try "[" + s.mkString.trim.split("\\s+").take(3).mkString(",") + "]"
        finally s.close()
      } catch { case _: Throwable => "[]" }
    val loadStart = loadavg()

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Optional comma-separated substring filter for targeted profiling runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSeq)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
    val results = names.map { case (name, fn) =>
      val times = (0 until reps).map { _ =>
        // guide §1.5: label jobs per query (queries with internal phases
        // refine the label themselves; this also clears a stale label
        // left by a previous query's construction-time phases)
        spark.sparkContext.setJobDescription(name)
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      (name, times.min, times)
    }
    // Mechanical contention flag: 1-min loadavg at START above ~2 means
    // another tenant owned cores while this record ran (this VM's driver
    // windows have measured 3-17x tails on sub-second queries under load),
    // so downstream tooling can filter records without reading the
    // calibration prose in BENCH_LOCAL.md.
    val contended =
      try loadStart.stripPrefix("[").split(",").head.toDouble > 2.0
      catch { case _: Throwable => false }
    // Fold a previous record's per-query mins into this run's (file-header
    // convention). Jackson ships with Spark; the record is machine-written
    // by this main, so the shapes are fixed. A tripped guard does NOT
    // silently degrade to an unmerged record: the refusal reason lands in
    // the JSON (merge_skipped_reason) and blocks the gate-file write.
    val (mins0, mergedRuns, mergeSkipped) = {
      val mine = results.map { case (k, v, _) => k -> v }.toMap
      sys.env.get("SPARK_GRAFT_BENCH_MERGE") match {
        case Some(f) =>
          try {
            val node = new com.fasterxml.jackson.databind.ObjectMapper()
              .readTree(new java.io.File(f))
            val prevSf = node.path("sf").asText("")
            val prevContended = node.path("contended").asBoolean(true)
            val pq = node.path("queries")
            val prev = scala.jdk.CollectionConverters
              .IteratorHasAsScala(pq.fieldNames()).asScala
              .map(n => n -> pq.path(n).asDouble()).toMap
            if (prevSf != sfDir)
              sys.error(s"sf mismatch: $prevSf vs $sfDir")
            if (prevContended)
              sys.error("refusing a contended record as merge input")
            if (contended)
              sys.error("refusing to fold a contended CURRENT run")
            if (prev.keySet != mine.keySet)
              sys.error(s"query sets differ (${prev.size} vs ${mine.size})")
            (mine.map { case (k, v) => k -> math.min(v, prev(k)) },
              node.path("merged_runs").asInt(1) + 1, None)
          } catch { case e: Throwable =>
            System.err.println(s"[bench] merge with $f skipped: ${e.getMessage}")
            (mine, 1, Some(e.getMessage))
          }
        case None => (mine, 1, None)
      }
    }
    val qs = results.map { case (k, _, _) => "\"" + k + "\":" + mins0(k) }
      .mkString("{", ",", "}")
    val perRep = results.map { case (k, _, ts) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map { case (k, _, _) => mins0(k) }.sum
    val loadEnd = loadavg()
    val skippedJson = mergeSkipped
      // control chars (a multi-line Jackson parse message, tabs) would
      // break the one-line record consumers parse — flatten them first
      .map(r => "\"" + r.replaceAll("\\p{Cntrl}", " ")
        .replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .getOrElse("null")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps_sec":$perRep,"sf":"$sfDir","reps":$reps,"merged_runs":$mergedRuns,"merge_skipped_reason":$skippedJson,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,"contended":$contended}"""
    println(line)
    // Land the record in files too: the driver's stdout tail-capture has
    // truncated the one-line JSON two rounds running (BENCH_r03/r04
    // "parsed": null), leaving no machine-readable per-round artifact.
    // File roles per the header convention: BENCH_round.json = every full
    // run as-executed; the gate file (BENCH_LOCAL.json) only gets a quiet,
    // merge-clean record — a contended or merge-refused run must leave the
    // committed record untouched (round 10's driver run overwrote the quiet
    // record in place; this is the structural fix). Filtered runs
    // (SPARK_GRAFT_BENCH_ONLY) are targeted profiling — they clobber
    // neither file unless OUT names a scratch path explicitly.
    val explicitOut = sys.env.get("SPARK_GRAFT_BENCH_OUT")
    val gateOk = only.isEmpty && !contended && mergeSkipped.isEmpty
    val outFiles =
      explicitOut.toSeq ++
        (if (only.isEmpty) Seq("BENCH_round.json") else Seq.empty) ++
        (if (gateOk && explicitOut.isEmpty) Seq("BENCH_LOCAL.json")
         else Seq.empty)
    if (!gateOk && explicitOut.isEmpty && only.isEmpty)
      System.err.println("[bench] gate file BENCH_LOCAL.json left untouched" +
        s" (contended=$contended, merge_skipped=${mergeSkipped.getOrElse("-")})")
    outFiles.distinct.foreach { f =>
      try {
        val out = new java.io.PrintWriter(f)
        try out.println(line) finally out.close()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $f: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
