package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.GraftExprColumn
import org.apache.spark.sql.types._

/** Deterministic argmax in ONE aggregate: the key whose score is maximal,
  * ties broken by the SMALLEST key — for any orderable (score, key) types.
  *
  * The shape it replaces is the "argmax join-back": `max(score)` per group,
  * join back, `min(key)` at the max — two aggregations and an equi-join
  * (two extra exchanges when the outer grouping differs from the argmax
  * grouping). `max_by` is not a substitute (ties are nondeterministic —
  * exactly what an oracle-replayable engine cannot emit), and the
  * `max(struct(score, key))` device (q117) only works when the tie-break
  * direction AGREES with the score direction; this aggregate handles the
  * common opposed case (max score, MIN key). First consumer: LabelProp's
  * per-round adoption (max neighbor-label count, lexicographically
  * smallest label on ties), where it folds three operators into one
  * combinable hash aggregate per round.
  *
  * DeclarativeAggregate (not TypedImperative): the buffer is two columns
  * and every transition is a pure expression, so update/merge participate
  * in whole-stage codegen and map-side partial aggregation for free.
  */
case class MaxScoreMinKey(score: Expression, key: Expression)
  extends DeclarativeAggregate {

  override def checkInputDataTypes(): TypeCheckResult = {
    val s = TypeUtils.checkForOrderingExpr(score.dataType, prettyName)
    if (s.isFailure) s
    else TypeUtils.checkForOrderingExpr(key.dataType, prettyName)
  }

  private lazy val bestS =
    AttributeReference("bestS", score.dataType, nullable = true)()
  private lazy val bestK =
    AttributeReference("bestK", key.dataType, nullable = true)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestS, bestK)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, score.dataType),
    Literal.create(null, key.dataType))

  // (s, k) beats the (curS, curK) buffer — null buffer always loses
  private def beats(s: Expression, k: Expression,
                    curS: Expression, curK: Expression): Expression =
    And(And(IsNotNull(s), IsNotNull(k)),
      Or(IsNull(curS),
        Or(GreaterThan(s, curS),
          And(EqualTo(s, curS), LessThan(k, curK)))))

  override lazy val updateExpressions: Seq[Expression] = {
    val take = beats(score, key, bestS, bestK)
    Seq(If(take, score, bestS), If(take, key, bestK))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = beats(bestS.right, bestK.right, bestS.left, bestK.left)
    Seq(If(take, bestS.right, bestS.left),
      If(take, bestK.right, bestK.left))
  }

  override lazy val evaluateExpression: Expression = bestK

  override def dataType: DataType = key.dataType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(score, key)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MaxScoreMinKey =
    copy(score = c(0), key = c(1))
  override def prettyName: String = "argmax_minkey"
}

object ArgExtremum {
  /** `df.groupBy(g).agg(maxScoreMinKey(score, key))` — the key at the
    * maximal score, smallest key on ties, NULL for all-null groups.
    */
  def maxScoreMinKey(score: Column, key: Column): Column =
    GraftExprColumn.column(
      MaxScoreMinKey(GraftExprColumn.expression(score),
        GraftExprColumn.expression(key)).toAggregateExpression())
}
