package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass PII redaction over a text column — the scrub stage every
  * training-data pipeline runs before tokenization (emails, phone numbers,
  * SSNs, IP addresses → typed placeholder tokens, plus per-type match
  * counts for the curation report).
  *
  * Reference scope: the reference pipeline normalizes raw exchange payloads
  * before insert (`app/src/crypto_data_pipeline_clickhouse.py` string
  * hygiene); this is the text-corpus generalization of that cleanup pass.
  *
  * Scale shape: a pure narrow map of codegen'd `regexp_extract_all` /
  * `regexp_replace` expressions — no shuffle, no UDF, O(bytes) per
  * partition, so it rides along with whatever scan partitioning the corpus
  * already has. At 100 TB this is scan-bound and embarrassingly parallel;
  * the only knob that matters is keeping it fused into the same
  * WholeStageCodegen as the scan (it is — see PlanSpec).
  *
  * Pattern portability: every regex stays inside the Java∩RE2 common
  * subset (character classes, bounded repetition, `\b` ASCII word
  * boundaries; no lookaround, no backreferences) so the DuckDB oracle can
  * replay the patterns verbatim. Counts are measured on the ORIGINAL text
  * per type; replacement is sequential in [[Default]] order, so an earlier
  * placeholder is never re-matched by a later pattern.
  *
  * Null convention (repo-wide, see TextFunctions.tokens): null text is
  * treated as the empty string — zero matches, empty redacted text.
  */
object Redact {

  /** (name, pattern, placeholder) — replacement applies in list order. */
  val Default: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn",   "\\b\\d{3}-\\d{2}-\\d{4}\\b",                      "<SSN>"),
    ("phone", "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b",                "<PHONE>"),
    ("ip",    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Replace `textCol` with its redacted form and add one `n_<name>`
    * LongType count column per pattern (match count on the original text).
    */
  def scrub(df: DataFrame, textCol: String,
            types: Seq[(String, String, String)] = Default): DataFrame = {
    val orig = coalesce(col(textCol), lit(""))
    val counted = types.foldLeft(df) { case (acc, (name, pat, _)) =>
      acc.withColumn(s"n_$name",
        size(regexp_extract_all(orig, lit(pat), lit(0))).cast("long"))
    }
    val redacted = types.foldLeft(orig: Column) { case (acc, (_, pat, tok)) =>
      regexp_replace(acc, pat, tok)
    }
    counted.withColumn(textCol, redacted)
  }
}
