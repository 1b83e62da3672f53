package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting — two-stage aggregation for hot keys.
  *
  * A single very hot key (one symbol carrying 10% of 100 TB) turns a
  * hash-aggregate exchange into one straggler task. Salting splits each key
  * into `buckets` pseudo-keys for the first (map-heavy) aggregation, then
  * reduces the per-salt partials — both stages get map-side combine, and no
  * reducer sees more than ~1/buckets of the hot key. Semantics-preserving
  * for algebraic aggregates (sum/count/min/max), which is why the salted
  * query oracle-matches the plain SQL aggregate (q41).
  *
  * (AQE's skew-join handling covers joins; this covers aggregation skew,
  * which AQE does not re-plan.)
  */
object Salted {

  /** groupBy(keys) with salted two-stage sum/count over `valueCol`.
    *
    * The salt is a DETERMINISTIC function of the row — a hash of EVERY
    * hashable column, not just (keys, value). Any row→salt assignment is
    * algebraically fine for sum/count, but a non-deterministic one
    * (e.g. monotonically_increasing_id) forces Spark to replay the whole
    * stage on partial task loss and blocks reuse/pushdown across it.
    * Hashing all columns matters when the value column has LOW CARDINALITY
    * under a hot key (summing a 0/1 flag): a (keys, value)-only salt would
    * collapse the hot key into ≤|distinct values| buckets, recreating the
    * straggler. Unhashable columns (maps, or structs/arrays containing
    * maps) are excluded; only a corpus whose rows are IDENTICAL on every
    * hashable column would still skew, and that input is better served by
    * a count-by-value pre-pass than by salting.
    */
  def sumCount(df: DataFrame, keys: Seq[String], valueCol: String,
               buckets: Int = 16): DataFrame = {
    val hashable = df.schema.fields.filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name))
    require(hashable.nonEmpty, "no hashable columns to salt on")
    val salted = df.withColumn("__salt",
      pmod(hash(hashable: _*), lit(buckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__s")).as(s"sum_$valueCol"),
        sum(col("__c")).cast("long").as("n"))
  }

  /** Skew-safe equi-join: the FACT side's rows fan out over `buckets`
    * pseudo-keys via a deterministic row-hash salt; the DIM side is
    * replicated once per bucket (explode of a literal sequence — dim cost
    * × buckets, the price of the spread) and the join runs on
    * (key, salt). No reducer sees more than ~1/buckets of a hot key's fact
    * rows. Result ≡ the plain inner join (each fact row meets its dim row
    * in exactly its own salt bucket).
    *
    * Use when one probe key dominates and the dim is too large to
    * broadcast (else broadcast wins) — the manual form of AQE's skew-join
    * split, but effective even where AQE can't see the skew (first
    * shuffle of a stage, or a key so hot a single AQE sub-split still
    * stalls). Dim must be unique per `key` (join multiplicity is the
    * caller's contract, as with any equi-join).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    val hashable = fact.schema.fields.filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name))
    val f = fact.withColumn("__salt", pmod(hash(hashable: _*), lit(buckets)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** `hash()` rejects MapType at any nesting depth (map ordering is
    * undefined) — detect it recursively so such columns are skipped.
    */
  private[ops] def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case ArrayType(et, _) => containsMap(et)
      case StructType(fields) => fields.exists(f => containsMap(f.dataType))
      case _ => false
    }
  }
}
