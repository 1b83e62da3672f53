package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins KTruss against a sequential brute-force reference that RECOMPUTES
  * triangles from scratch every round — the opposite implementation
  * strategy from the operator's retained-triangle-list peel, so agreement
  * checks the subset identity (removal can't create triangles), not just
  * the code against itself.
  */
class KTrussSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(e: (Long, Long)): (Long, Long) =
    (math.min(e._1, e._2), math.max(e._1, e._2))

  /** Full brute triangle recount over an edge set: edge → in-graph
    * support (edges in no triangle get no entry, like the operator).
    */
  private def supportOf(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
    val verts = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val sup = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    for {
      Seq(u, v, w) <- verts.combinations(3)
      if es(canon((u, v))) && es(canon((u, w))) && es(canon((v, w)))
    } {
      sup(canon((u, v))) += 1; sup(canon((u, w))) += 1
      sup(canon((v, w))) += 1
    }
    sup.toMap
  }

  /** Brute reference, recomputing triangles from scratch every round.
    * `rounds = Some(n)`: n support computations with removals between,
    * then the final ≥ k−2 filter (q220's unrolled contract);
    * `None`: peel to the fixed point.
    */
  private def refTruss(edges: Set[(Long, Long)], k: Int,
                       rounds: Option[Int]): Map[(Long, Long), Long] = {
    val need = k - 2L
    var es = edges.map(canon).filter(e => e._1 != e._2)
    var sup = supportOf(es)
    rounds match {
      case Some(n) =>
        var r = 1
        while (r < n) {
          es = es.filter(e => sup.getOrElse(e, 0L) >= need)
          sup = supportOf(es)
          r += 1
        }
        sup.filter(_._2 >= need)
      case None =>
        var done = false
        while (!done) {
          val keep = es.filter(e => sup.getOrElse(e, 0L) >= need)
          if (keep == es) done = true
          else { es = keep; sup = supportOf(es) }
        }
        sup.filter(_._2 >= need)
    }
  }

  private def run(edges: Set[(Long, Long)], k: Int,
                  fix: Boolean, rounds: Int = 2): Map[(Long, Long), Long] = {
    val df = edges.toSeq.toDF("a", "b")
    val out = if (fix) KTruss.fixpoint(df, "a", "b", k)
      else KTruss.peel(df, "a", "b", k, rounds)
    out.as[(Long, Long, Long)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
  }

  test("K4: every edge sits in 2 triangles, survives the 4-truss") {
    val k4 = (for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)).toSet
    val got = run(k4, k = 4, fix = true)
    assert(got.keySet === k4)
    assert(got.values.toSet === Set(2L))
  }

  test("two triangles sharing an edge: 4-truss peels everything") {
    // shared edge (1,2) has support 2 but the outer edges have 1; after
    // they peel, (1,2)'s support drops to 0 — the cascade the fixpoint
    // must follow and a single round would miss
    val g = Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    assert(run(g, k = 4, fix = true) === Map.empty)
    assert(run(g, k = 4, fix = true) === refTruss(g, 4, None))
    // one fixed round keeps the shared edge (superset semantics)
    assert(run(g, k = 4, fix = false, rounds = 1)
      === Map((1L, 2L) -> 2L))
  }

  test("fixpoint matches the brute recompute reference on random graphs") {
    val rnd = new scala.util.Random(777)
    (1 to 6).foreach { _ =>
      val n = 8 + rnd.nextInt(6)
      val g = (for {
        i <- 0L until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.35
      } yield (i, j)).toSet
      (3 to 5).foreach { k =>
        assert(run(g, k, fix = true) === refTruss(g, k, None),
          s"fixpoint k=$k on $g")
      }
    }
  }

  test("2-round peel matches the reference and q220's construction") {
    val rnd = new scala.util.Random(991)
    (1 to 4).foreach { _ =>
      val g = (for {
        i <- 0L until 10L; j <- (i + 1) until 10L
        if rnd.nextDouble() < 0.4
      } yield (i, j)).toSet
      assert(run(g, 4, fix = false, rounds = 2) === refTruss(g, 4, Some(2)),
        s"peel-2 on $g")
    }
  }

  test("cascade harness: predicted depth, truss = anchor scaffold") {
    // the q355 fixture: nChain = 16 must peel in exactly 9 rounds
    // (⌈16/2⌉ removal rounds + the convergence round), nChain = 8 in 5;
    // the surviving truss is the scaffold (skip + attach + anchor
    // edges), every chain edge peeled — all per cascadeHarness scaladoc
    Seq(16 -> 9, 8 -> 5).foreach { case (n, depth) =>
      val edges = KTruss.cascadeHarness(n, 100L)
      val res = KTruss.fixpointState(edges.toDF("a", "b"), "a", "b", k = 4)
      assert(res.converged, s"nChain=$n")
      assert(res.rounds === depth, s"nChain=$n depth")
      val got = res.edges.as[(Long, Long, Long)].collect()
        .map { case (a, b, s) => (a, b) -> s }.toMap
      assert(got === refTruss(edges.toSet, 4, None), s"nChain=$n truss")
      val chain = (0 until n).map(i => (100L + i, 100L + i + 1)).toSet
      assert(got.keySet.intersect(chain).isEmpty, s"nChain=$n chain peeled")
      assert(got.keySet === edges.toSet -- chain, s"nChain=$n scaffold kept")
      // skip edges settle at exactly the two anchor triangles
      val skips = (0 to n - 2).map(i => (100L + i, 100L + i + 2))
      assert(skips.forall(got(_) == 2L), s"nChain=$n skip support")
    }
  }

  test("fixpointState reports a capped run as non-converged") {
    val edges = KTruss.cascadeHarness(16, 100L)
    val res = KTruss.fixpointState(edges.toDF("a", "b"), "a", "b",
      k = 4, maxRounds = 3)
    assert(!res.converged && res.rounds === 3)
    // the capped result is a strict superset of the true truss
    val capped = res.edges.as[(Long, Long, Long)].collect()
      .map { case (a, b, _) => (a, b) }.toSet
    val truss = refTruss(edges.toSet, 4, None).keySet
    assert(truss.subsetOf(capped) && capped != truss)
  }

  test("edge orientation, duplicates, and self-loops are cleaned") {
    val k4 = (for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)).toSet
    val messy = (k4.toSeq ++ k4.toSeq.map(_.swap) ++ Seq((2L, 2L))).toDF("a", "b")
    val got = KTruss.fixpoint(messy, "a", "b", 4)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    assert(got.keySet === k4 && got.values.toSet === Set(2L))
  }
}
