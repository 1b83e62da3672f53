package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.GraftExprColumn
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keep the k best (score DESC, id ASC) pairs.
  *
  * The aggregate form of "top-N per group" (SURVEY.md §2.6 W1): a window
  * `row_number() <= k` must shuffle and SORT every row of each group; this
  * TypedImperativeAggregate holds a k-bounded heap per group with map-side
  * partial combine, so the exchange carries at most k pairs per (partition,
  * group) and nothing is ever globally sorted — the shape that wins when
  * groups are large (billions of rows, k of tens). Same role the bounded
  * heaps play inside [[graft.ops.Knn.topKJoin]], exposed as a reusable
  * aggregate on both the Column DSL and the SQL surface (`topk_pairs`).
  *
  * Output: `array<struct<score double, id bigint>>`, best first, at most k
  * elements; ties broken by lower id, so the result is total-order
  * deterministic.
  */
case class BoundedTopK(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1, s"k must be >= 1, got $k")

  // fail at analysis, not with a task-time ClassCastException (SQL literals
  // like 1.0 arrive as DECIMAL — the registration builders cast for you;
  // direct constructors must match exactly)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"topk_pairs expects (double, bigint), got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  private type Buf = scala.collection.mutable.PriorityQueue[(Double, Long)]
  // max-heap whose head is the WORST kept pair (lowest score, highest id)
  private def worstFirst: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2))

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.PriorityQueue.empty(worstFirst)

  private def insert(buf: Buf, s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      if (s > ws || (s == ws && i < wi)) { buf.dequeue(); buf.enqueue((s, i)) }
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (s, i) => insert(buf, s, i) }
    buf
  }

  override def eval(buf: Buf): Any = {
    val sorted = buf.toArray.sortBy(t => (-t._1, t._2))
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i): Any
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { insert(buf, in.readDouble(), in.readLong()); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BoundedTopK =
    copy(score = c(0), id = c(1))
  override def prettyName: String = "topk_pairs"
}

object BoundedTopK {
  /** Column-DSL form: `df.groupBy(g).agg(topkPairs(score, id, k))`.
    * `score` must be double, `id` long (cast at the call site).
    */
  def topkPairs(score: Column, id: Column, k: Int): Column =
    GraftExprColumn.column(
      BoundedTopK(GraftExprColumn.expression(score),
        GraftExprColumn.expression(id), k).toAggregateExpression())
}
