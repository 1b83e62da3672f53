package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Keep-last dedup = the ReplacingMergeTree/drop_duplicates(keep='last')
  * analog (SURVEY.md §2.5 A3/A4). Mirrors the reference's kline re-ingest
  * semantics: overlapping fetches must collapse to the latest version.
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (symbol, ts, ingest_seq, close) — duplicate (symbol, ts) keys on purpose
  private def frame = Seq(
    ("BTC", 1L, 1L, 100.0), ("BTC", 1L, 2L, 101.0),   // seq 2 wins
    ("BTC", 2L, 1L, 102.0),
    ("ETH", 1L, 3L, 10.0), ("ETH", 1L, 1L, 11.0),     // seq 3 wins
    ("ETH", 2L, 2L, 12.0), ("ETH", 2L, 5L, 13.0)      // seq 5 wins
  ).toDF("symbol", "ts", "ingest_seq", "close")

  test("keepLast keeps the highest-version row per key") {
    val out = Dedup.keepLast(frame, Seq("symbol", "ts"), Seq("ingest_seq"))
      .orderBy("symbol", "ts")
      .select("symbol", "ts", "ingest_seq", "close")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("BTC", 1L, 2L, 101.0), ("BTC", 2L, 1L, 102.0),
      ("ETH", 1L, 3L, 10.0), ("ETH", 2L, 5L, 13.0)))
  }

  test("agg-based and window-based keep-last agree") {
    val a = Dedup.keepLast(frame, Seq("symbol", "ts"), Seq("ingest_seq"))
    val b = Dedup.keepLastWindow(frame, Seq("symbol", "ts"), Seq("ingest_seq"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("idempotent: dedup(dedup(x)) == dedup(x)") {
    val once = Dedup.keepLast(frame, Seq("symbol", "ts"), Seq("ingest_seq"))
    val twice = Dedup.keepLast(once, Seq("symbol", "ts"), Seq("ingest_seq"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("upsert invariance: dedup(a union b) == dedup(dedup(a) union b) — batch split doesn't matter (T5 re-ingest safety)") {
    val Array(a, b) = frame.randomSplit(Array(0.5, 0.5), seed = 7)
    val direct = Dedup.keepLast(a.unionByName(b), Seq("symbol", "ts"), Seq("ingest_seq"))
    val staged = Dedup.keepLast(
      Dedup.keepLast(a, Seq("symbol", "ts"), Seq("ingest_seq")).unionByName(b),
      Seq("symbol", "ts"), Seq("ingest_seq"))
    assert(direct.exceptAll(staged).isEmpty && staged.exceptAll(direct).isEmpty)
  }

  test("exactByContent collapses byte-identical content, keeps min id") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y")).toDF("id", "text")
    val out = Dedup.exactByContent(docs, Seq("text"), "id")
      .orderBy("id").select("id", "text")
      .as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "a b c"), (3L, "x y")))
  }

  test("exactByContent fingerprint is unambiguous across column boundaries and NULLs") {
    // boundary shift: ("a b","c") vs ("a","b c") must NOT collide
    val shifted = Seq((1L, "a b", "c"), (2L, "a", "b c")).toDF("id", "t1", "t2")
    assert(Dedup.exactByContent(shifted, Seq("t1", "t2"), "id").count() === 2L)
    // NULL placement: (a,NULL,b) vs (a,b,NULL) must NOT collide (concat_ws
    // would silently skip the NULL and hash "a b" for both)
    val nulls = Seq((1L, "a", null, "b"), (2L, "a", "b", null))
      .toDF("id", "c1", "c2", "c3")
    assert(Dedup.exactByContent(nulls, Seq("c1", "c2", "c3"), "id").count() === 2L)
    // while true duplicates (including duplicate NULL placement) still collapse
    val dups = Seq((1L, "a", null, "b"), (2L, "a", null, "b"))
      .toDF("id", "c1", "c2", "c3")
    assert(Dedup.exactByContent(dups, Seq("c1", "c2", "c3"), "id")
      .select("id").as[Long].collect().toSeq === Seq(1L))
  }
}
