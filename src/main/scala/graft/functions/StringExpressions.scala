package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftExprColumn
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** String-distance expressions for the fuzzy-matching surface.
  *
  * Why custom: Spark ships `levenshtein` but nothing transposition-aware,
  * and entity-resolution blocking ("small rign" vs "small ring") wants
  * adjacent-swap = 1 edit, not 2. One compiled JVM pass per row, with real
  * `doGenCode` (the HashExpressions round-9 device — the generated Java
  * calls the same compiled `compute`, so the host stage never drops out of
  * whole-stage codegen; [[DamerauLevenshtein]] especially sits in fuzzy
  * VERIFY JOIN conditions, evaluated per candidate pair).
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
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    def compute(l: UTF8String, r: UTF8String): Int =
      distance(l.toString, r.toString)
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Integer.valueOf(
        compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("damerau", this,
        classOf[DamerauLevenshtein].getName)
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
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

  /** Aho–Corasick automaton over a fixed pattern set: goto/fail/output
    * tables built once per expression instance (driver-side, shipped with
    * the serialized expression), then ONE linear scan per row regardless
    * of pattern count — the multi-pattern blocklist shape, vs |P|
    * separate `contains` scans. Marks which patterns occur (any
    * position, overlaps included); [[MultiPatternHits]] returns the
    * DISTINCT-pattern hit count, which is what a blocklist gate
    * thresholds on and what plain SQL replays as
    * `len(list_filter(ps, p -> contains(text, p)))`.
    */
  private[functions] final class AhoCorasick(patterns: Seq[String])
      extends Serializable {
    private val goto_ = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    private val out = scala.collection.mutable.ArrayBuffer(
      scala.collection.immutable.BitSet.empty)
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        val nxt = goto_(s).get(ch)
        s = if (nxt != null) nxt.intValue
        else {
          goto_ += new java.util.HashMap[Character, Integer]()
          out += scala.collection.immutable.BitSet.empty
          goto_(s).put(ch, goto_.size - 1)
          goto_.size - 1
        }
      }
      out(s) = out(s) + pi
    }
    private val fail = Array.fill(goto_.size)(0)
    locally {
      val q = scala.collection.mutable.Queue.empty[Int]
      goto_(0).forEach((_, v) => q.enqueue(v.intValue))
      while (q.nonEmpty) {
        val u = q.dequeue()
        goto_(u).forEach { (ch, v) =>
          q.enqueue(v.intValue)
          var f = fail(u)
          while (f != 0 && goto_(f).get(ch) == null) f = fail(f)
          val t = goto_(f).get(ch)
          fail(v.intValue) =
            if (t != null && t.intValue != v.intValue) t.intValue else 0
          out(v.intValue) = out(v.intValue) | out(fail(v.intValue))
        }
      }
    }
    /** Number of DISTINCT patterns occurring in `text`. */
    def distinctHits(text: String): Int = {
      var s = 0
      var found = scala.collection.immutable.BitSet.empty
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        var g = goto_(s).get(ch)
        while (g == null && s != 0) { s = fail(s); g = goto_(s).get(ch) }
        s = if (g != null) g.intValue else 0
        if (out(s).nonEmpty) found = found | out(s)
        i += 1
      }
      found.size
    }
  }

  /** string → int: distinct blocklist patterns present in the text, via
    * one Aho–Corasick pass (patterns fixed at plan time).
    */
  case class MultiPatternHits(child: Expression, patterns: Seq[String])
      extends UnaryExpression {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "need a non-empty pattern set with non-empty patterns")
    override def dataType: DataType = IntegerType
    @transient private lazy val ac = new AhoCorasick(patterns)
    def compute(s: UTF8String): Int = ac.distinctHits(s.toString)
    override def nullSafeEval(v: Any): Any =
      java.lang.Integer.valueOf(compute(v.asInstanceOf[UTF8String]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("multiPattern", this,
        classOf[MultiPatternHits].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): MultiPatternHits =
      copy(child = c)
    override def prettyName: String = "multi_pattern_hits"
  }

  def multiPatternHits(text: Column, patterns: Seq[String]): Column =
    GraftExprColumn.column(MultiPatternHits(
      GraftExprColumn.expression(text), patterns))
}
