package graft

import org.apache.spark.sql.SparkSession

/** Degenerate-input fixtures + sweep shared by the ScaleProbe `degen`
  * mode and the CI `DegenSweepSpec`: every declared query runs against a
  * pathological corpus (empty / whitespace-only / single-token /
  * repeated-token documents, a ZERO embedding vector, NULL text and
  * embeddings, tied timestamps, all-zero amounts, non-JSON props) and,
  * separately, against ZERO-ROW variants of every table. This is exactly
  * the hazard class of the round-5 advisor findings (q76 negative slice
  * length, q100 descending `sequence` on empty token arrays):
  * data-dependent latent errors the generated corpus never triggers.
  * Promoted into `sbt test` so a new query cannot regress silently —
  * run the probe form by hand only when iterating on a fixture.
  */
object DegenFixtures {

  /** Queries that SEED from a specific data row (a query vector, a
    * k-means / PQ training set, a non-empty token graph) and therefore
    * fail LOUD BY DESIGN on zero-row tables — each via a `require` or a
    * head-of-empty, never a wrong answer. Everything else must return
    * empty, not crash. Adding a name here is a reviewed decision: it
    * asserts the new query's empty-input failure is intentional.
    */
  val expectedEmptySeedFailures: Set[String] = Set(
    "q35_knn_cosine", "q48_ivf_knn", "q54_ivf_trained", "q66_cell_knn_join",
    "q96_hybrid_rrf", "q104_ivf_recall", "q116_textrank", "q177_pq_recall",
    "q178_weighted_pagerank", "q180_hits", "q341_knn_graph_connectivity")

  private def write(spark: SparkSession, dir: String, name: String,
                    schema: org.apache.spark.sql.types.StructType,
                    rows: Seq[org.apache.spark.sql.Row]): Unit =
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      .repartition(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")

  /** Zero-row variant of every table (the empty-partition/empty-day
    * case).
    */
  def writeEmpty(spark: SparkSession, dir: String): Unit =
    Seq("documents" -> Tables.documentsSchema,
      "embeddings" -> Tables.embeddingsSchema,
      "region" -> Tables.regionSchema, "nation" -> Tables.nationSchema,
      "customer" -> Tables.customerSchema,
      "supplier" -> Tables.supplierSchema, "part" -> Tables.partSchema,
      "orders" -> Tables.ordersSchema, "lineitem" -> Tables.lineitemSchema,
      "events" -> Tables.eventsRawSchema)
      .foreach { case (n, s) => write(spark, dir, n, s, Seq.empty) }

  /** The pathological-content corpus. */
  def writePathological(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.{Row => R}
    val ts0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    write(spark, dir, "documents", Tables.documentsSchema, Seq(
      R(0L, "", "en", "web", 0L),                       // empty text
      R(1L, "   ", "en", "web", 3L),                    // whitespace only
      R(2L, "solo", "en", "web", 4L),                   // single token
      R(3L, "a a a a a a a a", "fr", "book", 15L),      // one repeated token
      R(4L, "the quick brown fox jumps over the lazy dog", "en", "web", 43L),
      R(5L, ("tok " * 200).trim, "fr", "book", 799L),   // long uniform run
      R(6L, null, "en", "web", null)))                  // NULL text + n_chars
    val dim = 8
    write(spark, dir, "embeddings", Tables.embeddingsSchema,
      (0 until 30).map { i =>
        val v: Seq[Float] =
          if (i == 7) Seq.fill(dim)(0.0f)               // ZERO vector
          else if (i == 11) null                        // NULL embedding
          else Seq.tabulate(dim)(j => ((i + j) % 5 - 2).toFloat)
        R(i.toLong, v, i % 3)
      })
    write(spark, dir, "region", Tables.regionSchema,
      Seq(R(0, "EUROPE"), R(1, "ASIA")))
    write(spark, dir, "nation", Tables.nationSchema,
      Seq(R(0, "FRANCE", 0), R(1, "CHINA", 1)))
    write(spark, dir, "customer", Tables.customerSchema, Seq(
      R(1L, "c1", 0, 0.0, "BUILDING"), R(2L, "c2", 1, -5.5, "AUTOMOBILE")))
    write(spark, dir, "supplier", Tables.supplierSchema,
      Seq(R(1L, "s1", 0, 1.0), R(2L, "s2", 1, 2.0)))
    write(spark, dir, "part", Tables.partSchema, Seq(
      R(1L, "p1", "Brand#1", "TYPE A", 1, 10.0),
      R(2L, "p2", "Brand#2", "TYPE B", 2, 20.0)))
    write(spark, dir, "orders", Tables.ordersSchema, Seq(
      R(1L, 1L, "O", 100.0, ts0, "1-URGENT"),
      R(2L, 2L, "F", 200.0, ts0.plusDays(400), "5-LOW"),
      R(3L, 1L, "O", 0.0, ts0, "3-MEDIUM")))            // zero price
    write(spark, dir, "lineitem", Tables.lineitemSchema, Seq(
      R(1L, 1L, 1L, 1, 0.0, 0.0, 0.0, 0.0, "R", "F", ts0),   // all-zero amounts
      R(1L, 2L, 2L, 2, 5.0, 100.0, 1.0, 0.1, "A", "O", ts0), // 100% discount
      R(2L, 1L, 1L, 1, 3.0, 50.0, 0.05, 0.0, "N", "O", ts0.plusDays(400)),
      R(3L, 2L, 2L, 1, 7.0, 70.0, 0.5, 0.2, "R", "F", ts0)))
    // events: raw int64 NANO timestamps; three rows share one instant (ties)
    val nano0 = 1704067200000000000L
    write(spark, dir, "events", Tables.eventsRawSchema, Seq(
      R(1L, nano0, 1L, "view", 1.0, """{"k": 1}"""),
      R(2L, nano0, 1L, "view", 2.0, """{"k": 2}"""),    // tied ts, same user
      R(3L, nano0, 1L, "purchase", 3.0, null),          // null props
      R(4L, nano0 + 3600L * 1000000000L, 2L, "error", -1.0, """{"k": -9}"""),
      R(5L, nano0 + 7200L * 1000000000L, 2L, "view", 0.0, """not json""")))
  }

  /** Run every declared query's builder against `dir`, materializing via
    * the noop sink; returns (query, one-line error) per crash.
    */
  def sweep(spark: SparkSession, dir: String): Seq[(String, String)] =
    Queries.all.flatMap { q =>
      try {
        q.fn(spark, dir).write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable =>
        Some(q.name -> s"${e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
}
