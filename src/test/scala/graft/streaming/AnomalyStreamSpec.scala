package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark
import AnomalyStream.{Flag, Reading}

/** Streaming z-score anomaly flags: reference equivalence, batch-split
  * invariance, spike detection, warm-up suppression.
  */
class AnomalyStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(batches: Seq[Seq[Reading]]): Seq[Flag] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Reading]
    val q = AnomalyStream.flags(mem.toDS(), zThreshold = 3.0, minSamples = 5)
      .writeStream.outputMode("append")
      .format("memory").queryName("anomaly_out")
      .start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table("anomaly_out").as[Flag].collect().toSeq
    } finally q.stop()
  }

  // steady signal around 10.0 with one 100.0 spike at ts=20, per key
  private def stream(key: String): Seq[Reading] = {
    val rnd = new scala.util.Random(key.hashCode)
    (1L to 30L).map { t =>
      val v = if (t == 20) 100.0 else 10.0 + rnd.nextGaussian() * 0.5
      Reading(key, t, v)
    }
  }

  test("streaming flags == sequential reference, and the spike is caught") {
    val rows = stream("a") ++ stream("b")
    val got = run(Seq(rows)).sortBy(f => (f.key, f.tsUs))
    val want = AnomalyStream.referenceFlags(rows, 3.0, 5)
      .sortBy(f => (f.key, f.tsUs))
    assert(got === want)
    // the injected spikes are flagged (a tight early sigma may legitimately
    // flag an extra near-boundary value; the reference-equality above pins
    // that those flags are the fold's true output, not drift)
    val flagged = got.filter(_.anomalous).map(f => (f.key, f.tsUs)).toSet
    assert(Set(("a", 20L), ("b", 20L)).subsetOf(flagged))
    assert(flagged.forall(_._2 > 5), "nothing inside the warm-up window")
  }

  test("batch-split invariance for event-time-ordered batches") {
    val rows = stream("k")
    val one = run(Seq(rows)).sortBy(_.tsUs)
    val many = run(Seq(rows.take(7), rows.slice(7, 8), rows.slice(8, 19),
      rows.slice(19, 30))).sortBy(_.tsUs)
    assert(one === many)
  }

  test("warm-up rows (fewer than minSamples priors) are never flagged") {
    val rows = (1L to 4L).map(t => Reading("w", t, t * 1000.0)) // wild values
    val got = run(Seq(rows))
    assert(got.forall(f => !f.anomalous && f.z == 0.0))
  }
}
