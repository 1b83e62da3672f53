package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.GraftExprColumn
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** String-distance expressions for the fuzzy-matching surface.
  *
  * Why custom: Spark ships `levenshtein` but nothing transposition-aware,
  * and entity-resolution blocking ("small rign" vs "small ring") wants
  * adjacent-swap = 1 edit, not 2. One compiled JVM pass per row
  * (`CodegenFallback` is fine — per-row work is the O(n·m) table, which
  * dwarfs the one boxed call, the HashExpressions argument).
  */
object StringExpressions {

  /** FULL Damerau–Levenshtein distance (unrestricted transpositions, the
    * alphabet-table algorithm) — NOT the cheaper optimal-string-alignment
    * restriction: dl("CA","ABC") = 2, where OSA gives 3. This is the
    * variant the DuckDB oracle's `damerau_levenshtein` computes (probed:
    * CA/ABC → 2), so the integer distance is hash-exact cross-engine.
    * Complexity O(n·m) time, O(n·m) space per row — intended for SHORT
    * strings (names, titles) after blocking, not documents.
    */
  case class DamerauLevenshtein(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[UTF8String].toString
      val b = r.asInstanceOf[UTF8String].toString
      java.lang.Integer.valueOf(distance(a, b))
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DamerauLevenshtein = copy(left = l, right = r)
    override def prettyName: String = "damerau_levenshtein"
  }

  private[functions] def distance(a: String, b: String): Int = {
    val n = a.length; val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // d is (n+2)×(m+2) with the extra -1 band the transposition case reads
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    // last row index (1-based) at which each char occurred in `a`
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = Option(da.get(b.charAt(j - 1))).map(_.intValue).getOrElse(0)
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - 1 - k) + 1 + (j - 1 - l)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftExprColumn.column(DamerauLevenshtein(
      GraftExprColumn.expression(a), GraftExprColumn.expression(b)))
}
