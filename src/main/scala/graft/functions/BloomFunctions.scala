package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.classic.GraftExprColumn
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a compiled Catalyst predicate.
  *
  * `BloomMightContainLong` carries the SERIALIZED filter (a byte array —
  * task-serializable at any filter size the driver can build) and
  * deserializes it once per operator instance: lazily on the interpreted
  * path, in the codegen'd operator's init block on the compiled path. The
  * per-row cost is then two xxhash64 rounds + k bit probes, inlined into
  * whole-stage codegen — no boxing, no UDF.
  *
  * No false negatives ever; false positives at the filter's configured fpp
  * (callers that need exactness re-verify with a real join — see
  * ops/BloomSemiJoin).
  */
object BloomFunctions {

  case class BloomMightContainLong(bloomSer: Array[Byte], child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case LongType | IntegerType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"bloom_might_contain needs an integral key, got $t")
      }

    @transient private lazy val bf: BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomSer))

    override def nullSafeEval(v: Any): Any = {
      val k = v match {
        case i: java.lang.Integer => i.longValue()
        case l => l.asInstanceOf[Long]
      }
      java.lang.Boolean.valueOf(bf.mightContainLong(k))
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val bytesRef = ctx.addReferenceObj("graftBloomSer", bloomSer, "byte[]")
      val bfClass = classOf[BloomFilter].getName
      val bfVar = ctx.addMutableState(bfClass, "graftBloom",
        v => s"""try {
                |  $v = $bfClass.readFrom(new java.io.ByteArrayInputStream($bytesRef));
                |} catch (java.io.IOException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $bfVar.mightContainLong((long) $c);")
    }

    override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
      copy(child = c)
    override def prettyName: String = "bloom_might_contain"
  }

  def mightContainLong(bloomSer: Array[Byte], key: Column): Column =
    GraftExprColumn.column(
      BloomMightContainLong(bloomSer, GraftExprColumn.expression(key)))

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
