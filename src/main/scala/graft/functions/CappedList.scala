package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.classic.GraftExprColumn
import org.apache.spark.sql.types._

/** collect_list with a HARD buffer cap: appends stop once the buffer
  * holds `cap` elements (merge keeps the first `cap` of the
  * concatenation). The df-cut postings build is the consumer: a posting
  * list is only USED when its document frequency is ≤ maxDf, so
  * collecting at cap = maxDf+1 yields the complete list for every
  * under-cut shingle while bounding the aggregation buffer of an
  * ultra-common shingle (boilerplate posted by millions of docs) at
  * cap elements instead of the full posting — the skew valve that
  * previously required a separate count-aggregate pass plus a semi-join
  * BEFORE any collect_list could run safely (guide §2.5: a single giant
  * key no AQE split can save; §2.3: one combinable pass instead of two).
  *
  * Which `cap` elements survive an over-cap group is partition-order
  * dependent — callers MUST NOT read the list of a group whose count
  * exceeds the cap (pair a count(*) alongside and filter first).
  *
  * DeclarativeAggregate like [[MaxScoreMinKey]]: pure-expression
  * transitions, so update/merge run in whole-stage codegen with
  * map-side partial aggregation.
  */
case class CappedList(child: Expression, cap: Int)
  extends DeclarativeAggregate {

  require(cap >= 1, s"cap=$cap must be >= 1")

  private lazy val arrType = ArrayType(child.dataType, child.nullable)
  private lazy val arr = AttributeReference("arr", arrType,
    nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(arr)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(Seq.empty[Any], arrType))

  // append while below cap; null inputs are skipped (collect_list parity)
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(Or(IsNull(child), GreaterThanOrEqual(Size(arr), Literal(cap))),
      arr,
      Concat(Seq(arr, CreateArray(Seq(child))))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Slice(Concat(Seq(arr.left, arr.right)), Literal(1), Literal(cap)))

  override lazy val evaluateExpression: Expression = arr

  override def dataType: DataType = arrType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CappedList = copy(child = c(0))
  override def prettyName: String = "capped_list"
}

object CappedList {
  /** `df.groupBy(g).agg(cappedList(x, cap))` — the group's values, at
    * most `cap` of them (complete iff the group has ≤ cap rows).
    */
  def cappedList(child: Column, cap: Int): Column =
    GraftExprColumn.column(
      CappedList(GraftExprColumn.expression(child), cap)
        .toAggregateExpression())
}
