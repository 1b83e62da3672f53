package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property-style checks of the upsert algebra (SURVEY.md §5): keep-last is
  * idempotent and batch-split-invariant for ANY interleaving of versions —
  * the exact guarantee the reference leans on when it refetches overlapping
  * kline ranges (T5 re-ingest safety). Seeded generation, 20 trials.
  */
class DedupPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("k", "ts")
  private val ver = Seq("seq")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "ts", "seq", "v").as[(String, Long, Long, Double)]
      .collect().toSeq.sorted

  test("property: dedup is idempotent, split-invariant, one row per key (20 seeded trials)") {
    for (trial <- 0 until 20) {
      val rng = new scala.util.Random(1000 + trial)
      // small key space forces heavy duplication; seq unique by index
      val rows = List.tabulate(40) { i =>
        (Seq("A", "B", "C")(rng.nextInt(3)), rng.nextInt(4).toLong,
          i.toLong, rng.nextInt(1000).toDouble)
      }
      val df = rows.toDF("k", "ts", "seq", "v")
      val once = Dedup.keepLast(df, keys, ver)
      val onceRows = canon(once)

      // idempotence
      assert(canon(Dedup.keepLast(once, keys, ver)) === onceRows, s"trial $trial")

      // split-invariance: dedup(a ∪ b) == dedup(dedup(a) ∪ b)
      val cut = rng.nextInt(rows.size + 1)
      val (a, b) = rows.splitAt(cut)
      val merged =
        if (a.isEmpty) b.toDF("k", "ts", "seq", "v")
        else Dedup.keepLast(a.toDF("k", "ts", "seq", "v"), keys, ver)
          .unionByName(
            if (b.isEmpty) spark.emptyDataset[(String, Long, Long, Double)]
              .toDF("k", "ts", "seq", "v")
            else b.toDF("k", "ts", "seq", "v"))
      assert(canon(Dedup.keepLast(merged, keys, ver)) === onceRows, s"trial $trial cut $cut")

      // exactly one row per distinct key; winner has the max seq per key
      val byKey = rows.groupBy(r => (r._1, r._2))
      assert(onceRows.size === byKey.size, s"trial $trial")
      onceRows.foreach { case (k, ts, seq, _) =>
        assert(seq === byKey((k, ts)).map(_._3).max, s"trial $trial key ($k,$ts)")
      }
    }
  }
}
