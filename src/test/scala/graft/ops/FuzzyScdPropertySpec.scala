package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Seeded randomized properties for the round-6 continuation ops:
  * FuzzyJoin ≡ brute force on arbitrary small-alphabet corpora (the
  * deletion-neighborhood construction has no tuning knob to hide behind),
  * and Scd.buildType2's interval algebra (partition per key, compression,
  * current-row uniqueness) against a sequential reference.
  */
class FuzzyScdPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("property: fuzzy join == brute force on random small-alphabet strings (10 seeded trials)") {
    for (trial <- 0 until 10) {
      val rng = new scala.util.Random(7000 + trial)
      // alphabet {a,b}, length 0-5: dense edit-distance neighborhoods,
      // many shared-variant-but-distance-2 traps
      val rows = List.tabulate(30) { i =>
        (i.toLong,
          List.fill(rng.nextInt(6))(('a' + rng.nextInt(2)).toChar).mkString)
      }
      val got = FuzzyJoin.editDistance1Pairs(
          rows.toDF("id", "s"), "id", "s")
        .select("id_a", "id_b", "dist")
        .as[(Long, Long, Long)].collect().toSet
      val brute = (for {
        (i, a) <- rows; (j, b) <- rows if i < j
        d = lev(a, b) if d <= 1
      } yield (i, j, d.toLong)).toSet
      assert(got === brute, s"trial $trial")
    }
  }

  test("property: SCD2 intervals chain, compress, and keep one current row per key (10 seeded trials)") {
    for (trial <- 0 until 10) {
      val rng = new scala.util.Random(8000 + trial)
      // few keys, few attr values -> long runs to compress; unique ts per key
      val rows = (for {
        k <- 0L until 4L
        ts <- rng.shuffle((0 until 30).toList).take(5 + rng.nextInt(20)).sorted
      } yield (k, ts.toLong, s"v${rng.nextInt(3)}")).toList
      val got = Scd.buildType2(rows.toDF("k", "ts", "a"), Seq("k"), "ts", Seq("a"))
        .select("k", "a", "valid_from", "valid_to", "is_current")
        .as[(Long, String, Long, Option[Long], Boolean)]
        .collect().toSeq.sortBy(r => (r._1, r._3))

      // sequential reference: keep changes only
      val ref = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        val changes = rs.sortBy(_._2)
          .foldLeft(List.empty[(Long, String)]) { case (acc, (_, ts, a)) =>
            if (acc.headOption.exists(_._2 == a)) acc else (ts, a) :: acc
          }.reverse
        changes.zip(changes.drop(1).map(c => Some(c._1)) :+ None).map {
          case ((from, a), to) => (k, a, from, to, to.isEmpty)
        }
      }.sortBy(r => (r._1, r._3))
      assert(got === ref, s"trial $trial")

      // invariants: exactly one current row per key; intervals abut exactly
      got.groupBy(_._1).foreach { case (k, iv) =>
        assert(iv.count(_._5) === 1, s"trial $trial key $k current-count")
        iv.sortBy(_._3).sliding(2).foreach {
          case Seq((_, _, _, Some(to), _), (_, _, from2, _, _)) =>
            assert(to === from2, s"trial $trial key $k gap")
          case _ => ()
        }
      }
    }
  }
}
