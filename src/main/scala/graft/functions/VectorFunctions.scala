package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (similarity-search surface of the
  * BASELINE.json north star). Pure higher-order-function compositions over
  * `array<float>` columns — codegen'd, no UDF boxing, and exactly replayable
  * in the oracle (same left-to-right IEEE double accumulation).
  */
object VectorFunctions {

  /** float[] → double[] (exact widening; all arithmetic is then double). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product via zip_with + left-to-right fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** ZERO-NORM CONVENTION (all cosine paths in this engine — here,
    * [[graft.functions.HashExpressions.CosineSim]], and the mapPartitions
    * kernels in ops/Knn): a zero vector has cosine 0.0 to everything.
    * Under ANSI mode a plain column division throws DIVIDE_BY_ZERO the
    * first time a degenerate embedding reaches it (and the JVM-side 0/0
    * NaN poisons BigDecimal rounding) — a data-dependent crash no test
    * corpus triggers. `try_divide` + coalesce keeps the plan codegen'd.
    */
  private def safeCos(num: Column, den: Column): Column =
    coalesce(try_divide(num, den), lit(0.0))

  /** Cosine similarity of two double[] vectors (0.0 if either is zero). */
  def cosine(a: Column, b: Column): Column =
    safeCos(dot(a, b), l2Norm(a) * l2Norm(b))

  /** Cosine against a pre-normalized constant query vector: precompute the
    * query's norm once on the driver; per row only one dot + one norm.
    */
  def cosineToQuery(v: Column, query: Seq[Double]): Column = {
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val q = array(query.map(lit): _*)
    safeCos(dot(v, q), l2Norm(v) * lit(qNorm))
  }
}
