package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.classic.GraftExprColumn
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave — the multi-dimension clustering key.
  *
  * Sorting a table by ONE column gives perfect min/max pruning on that
  * column and none on any other; sorting by the bit-interleave of two
  * columns gives (slightly weaker) pruning on BOTH — every parquet
  * file/row-group covers a small rectangle of the (x, y) space, so a scan
  * filtered on either dimension skips most files on footer stats alone.
  * At 100 TB, file skipping is the difference between touching 100 TB and
  * touching 100 GB; this is the same layout idea Delta/Iceberg expose as
  * OPTIMIZE ZORDER BY, implemented here as a plain Catalyst expression you
  * can `repartitionByRange` + `sortWithinPartitions` on
  * (see [[graft.sources.PartitionedStore.writeClustered]]).
  *
  * Inputs are masked to their low 31 bits (callers rank/bucket real values
  * into that range first — interleave is only meaningful on bounded
  * non-negative coordinates); the result is a non-negative long of 62
  * interleaved bits, y in the odd positions. Compiled via the standard
  * mask-spread sequence — 12 shift/mask ops per side, no loop, inlined by
  * whole-stage codegen.
  */
object ZOrderFunctions {

  /** Spread the low 31 bits of x into the even bit positions. */
  @inline def spread31(v0: Long): Long = {
    var x = v0 & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Reference (bit-at-a-time) interleave, used by the spec as the oracle
    * for the spread-based fast path.
    */
  def interleaveRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  private val spreadCode: Seq[(Int, Long)] = Seq(
    16 -> 0x0000ffff0000ffffL, 8 -> 0x00ff00ff00ff00ffL,
    4 -> 0x0f0f0f0f0f0f0f0fL, 2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  case class InterleaveBits(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case LongType | IntegerType => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("zorder needs integral coordinates")
    }

    private def asLong(v: Any): Long = v match {
      case i: java.lang.Integer => i.longValue()
      case l => l.asInstanceOf[Long]
    }

    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Long.valueOf(
        spread31(asLong(l)) | (spread31(asLong(r)) << 1))

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val x = ctx.freshName("zx")
        val y = ctx.freshName("zy")
        def spread(v: String): String =
          spreadCode.map { case (s, m) =>
            s"$v = ($v | ($v << $s)) & ${m}L;"
          }.mkString("\n")
        s"""
          |long $x = ((long) $a) & 0x7fffffffL;
          |long $y = ((long) $b) & 0x7fffffffL;
          |${spread(x)}
          |${spread(y)}
          |${ev.value} = $x | ($y << 1);
        """.stripMargin
      })

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): InterleaveBits = copy(left = l, right = r)
    override def prettyName: String = "zorder2"
  }

  /** 62-bit Morton code of two integral columns (each masked to 31 bits). */
  def zorder(x: Column, y: Column): Column =
    GraftExprColumn.column(InterleaveBits(
      GraftExprColumn.expression(x), GraftExprColumn.expression(y)))

  /** Bucket index of `child` within sorted `boundaries`: the count of
    * boundaries ≤ value (binary search, compiled). The rank-space mapper
    * for [[zorder]] coordinates: boundaries come from a driver-bounded
    * approx-quantile sketch, so skewed dimensions still bucket evenly —
    * no window, no join, one broadcast array probed in O(log k) per row.
    */
  case class BoundaryBucket(boundaries: Array[Double], child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case _: NumericType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"boundary_bucket needs a numeric input, got $t")
      }

    private def toD(v: Any): Double = v match {
      case d: java.lang.Double => d
      case f: java.lang.Float => f.toDouble
      case i: java.lang.Integer => i.toDouble
      case l: java.lang.Long => l.toDouble
      case s: java.lang.Short => s.toDouble
      case b: java.lang.Byte => b.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
    }

    override def nullSafeEval(v: Any): Any =
      java.lang.Long.valueOf(ZOrderFunctions.bucketOf(boundaries, toD(v)).toLong)

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("graftBoundaries", boundaries, "double[]")
      val cls = "graft.functions.ZOrderFunctions"
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = (long) $cls.bucketOf($ref, (double) $c);")
    }

    override protected def withNewChildInternal(c: Expression): BoundaryBucket =
      copy(child = c)
    override def prettyName: String = "boundary_bucket"
  }

  /** Count of boundaries ≤ v over a sorted array (binary search). */
  def bucketOf(boundaries: Array[Double], v: Double): Int = {
    var lo = 0; var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def boundaryBucket(boundaries: Array[Double], v: Column): Column =
    GraftExprColumn.column(BoundaryBucket(boundaries,
      GraftExprColumn.expression(v)))
}
