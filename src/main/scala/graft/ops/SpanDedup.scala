package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level span deduplication — the CCNet/RefinedWeb "line dedup" step
  * re-expressed for a corpus whose documents are single-line: cut every
  * document into fixed-width non-overlapping token spans, count in how many
  * *distinct* documents each span occurs, and strip the spans that occur in
  * `maxDf` or more documents (boilerplate, licence headers, navigation chrome
  * — at web scale these are the bulk of near-duplicate bytes that
  * document-level dedup misses because the *documents* differ).
  *
  * Reference provenance: the reference pipeline dedups whole rows only
  * (SURVEY.md §2 A3/A4); sub-document dedup is part of the LLM-training-data
  * extension surface (BASELINE.json).
  *
  * Shape at 100 TB:
  *   - span table = one row per (doc, span index) — a constant factor of the
  *     corpus itself (width w ⇒ n/w rows carrying the full text between
  *     them); it is never collected and never hits a single task whole.
  *   - document frequency = two-stage hash aggregation on the span string
  *     ((span, doc) partial → span count). Both stages map-side combine; the
  *     Zipf head (a span repeated across half the corpus) collapses into one
  *     row per partition before the exchange, so the hot key ships O(|parts|)
  *     rows, not O(corpus).
  *   - the verdict join back to spans shuffles on the span string once; the
  *     reassembly groupBy(doc) holds one document's spans per group — the
  *     same O(doc) state the raw text row already costs, never O(corpus).
  *   - at extreme scale, [[dedupSpansBroadcast]] broadcasts only the
  *     common-span SET (df ≥ maxDf survivors — the short Zipf head) as
  *     hashed side input and skips the join-back shuffle, accepting a
  *     2^-64 per-pair hash-collision risk (the SnapshotDiff class of
  *     trade); [[dedupSpans]] joins on the literal span and is the
  *     oracle-exact form.
  *
  * Determinism: spans are keyed by their literal text (not a hash), so the
  * result is engine-reproducible and the DuckDB oracle can replay it
  * verbatim; hash-keying the join is a documented optimisation that would
  * trade a collision probability for shuffle bytes.
  */
object SpanDedup {

  /** Non-overlapping `width`-token spans of `toks` as (index, span-text)
    * rows, via posexplode-ready array. Last span may be shorter. Empty token
    * arrays yield an empty span array (guarded: Spark's `sequence(0,-1)`
    * would count DOWN, not produce empty).
    */
  def spanArray(toks: Column, width: Int): Column = {
    val n = size(toks)
    when(n > 0,
      transform(
        sequence(lit(0), ceil(n.cast("double") / width).cast("int") - 1),
        i => array_join(slice(toks, i * width + 1, lit(width)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Strip spans occurring in ≥ `maxDf` distinct documents.
    *
    * @param docs    input with `idCol` (unique per document) and `toksCol`
    *                (array&lt;string&gt; tokens)
    * @return one row per document: idCol, n_spans, dropped_spans,
    *         kept_text (space-joined surviving spans, "" if all dropped)
    */
  def dedupSpans(docs: DataFrame, idCol: String, toksCol: String,
                 width: Int, maxDf: Int): DataFrame = {
    val spans = docs
      .select(col(idCol), posexplode(spanArray(col(toksCol), width)).as(Seq("__i", "__span")))

    // distinct-doc frequency without Expand: (span, doc) partial, then count.
    val df = spans.select(col(idCol), col("__span")).distinct()
      .groupBy(col("__span")).agg(count(lit(1)).as("__df"))

    spans.join(df, "__span")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__i"), col("__span"), col("__df"))))
        .as("__sp"))
      .select(
        col(idCol),
        size(col("__sp")).cast("long").as("n_spans"),
        size(filter(col("__sp"), s => s("__df") >= maxDf)).cast("long").as("dropped_spans"),
        array_join(
          transform(filter(col("__sp"), s => s("__df") < maxDf), s => s("__span")),
          " ").as("kept_text"))
  }

  /** The extreme-scale variant the exact join trades against: only the
    * COMMON spans (df ≥ maxDf — typically ≪ 1% of distinct spans: the
    * Zipf head is short) are kept, hashed, and broadcast; the verdict is
    * then a broadcast semi-lookup instead of shuffling the whole span
    * table back through a join. One corpus-sized shuffle (the df count)
    * instead of two. Identical output to [[dedupSpans]] — spec-pinned —
    * as long as the common-span set fits the broadcast budget
    * (`maxCommonSpans` fails loud rather than silently OOMing the
    * driver; at that point use the exact join, which has no such bound).
    */
  def dedupSpansBroadcast(docs: DataFrame, idCol: String, toksCol: String,
                          width: Int, maxDf: Int,
                          maxCommonSpans: Long = 10000000L): DataFrame = {
    val spark = docs.sparkSession
    val spans = docs
      .select(col(idCol), posexplode(spanArray(col(toksCol), width)).as(Seq("__i", "__span")))
    val common = spans.select(col(idCol), col("__span")).distinct()
      .groupBy(col("__span")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= maxDf)
      // distinct: two different common spans colliding in xxhash64 must not
      // produce duplicate __h rows — the left join below would fan out and
      // double-count spans (silent corruption, not just a false drop).
      .select(xxhash64(col("__span")).as("__h")).distinct()
    val nCommon = common.count()
    require(nCommon <= maxCommonSpans,
      s"$nCommon common spans exceed the broadcast budget $maxCommonSpans — " +
        "use dedupSpans (exact join) instead")
    spans
      .join(broadcast(common), xxhash64(col("__span")) === col("__h"), "left")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__i"), col("__span"),
        col("__h").isNotNull.as("__drop")))).as("__sp"))
      .select(
        col(idCol),
        size(col("__sp")).cast("long").as("n_spans"),
        size(filter(col("__sp"), s => s("__drop"))).cast("long").as("dropped_spans"),
        array_join(
          transform(filter(col("__sp"), s => !s("__drop")), s => s("__span")),
          " ").as("kept_text"))
  }
}
