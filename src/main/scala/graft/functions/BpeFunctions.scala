package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftExprColumn
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer INFERENCE — apply a trained merge list to unseen text.
  *
  * [[graft.ops.BpeTrain]] is the training half (corpus-collapsed,
  * vocab-bounded merge rounds); this is the half every tokenizer ships to
  * production: given the learned merges, encode a word into its symbol
  * sequence. The merge list is a driver-side literal (vocab-budget-
  * bounded, the same Seq the trainer returned), shipped inside the
  * serialized expression — so encoding is one compiled JVM pass per word,
  * no join against a merge table, no per-row state.
  *
  * Semantics pinned to training exactly: symbols start as single code
  * points (what `split(w, '')` produced at training time and what the
  * oracle's `substring(w, i, 1)` enumeration produces), then each merge
  * applies GREEDILY left-to-right non-overlapping — the linear-scan
  * equivalent of the trainer's run-parity rule (matched positions chain
  * only when a = b; keeping odd run-indexes = consuming pairs as the scan
  * walks). A merged symbol a||b can never re-match (a, b) inside the same
  * round (its length exceeds |a|), so scanning the evolving sequence and
  * scanning the pre-round state select the same positions, and
  * encode(training word) reproduces the trainer's final state verbatim
  * (BpeEncodeSpec pins this).
  */
object BpeFunctions {

  case class BpeEncode(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    // merge list in scan-ready form, built once per (driver) instance and
    // shipped with the expression
    @transient private lazy val mergeArr: Array[Array[String]] =
      merges.map { case (a, b) => Array(a, b) }.toArray

    def compute(w: UTF8String): ArrayData = {
      val s = w.toString
      var syms = new java.util.ArrayList[String](s.length)
      var i = 0
      while (i < s.length) {
        val n = Character.charCount(s.codePointAt(i))
        syms.add(s.substring(i, i + n))
        i += n
      }
      var m = 0
      while (m < mergeArr.length) {
        val a = mergeArr(m)(0)
        val b = mergeArr(m)(1)
        val out = new java.util.ArrayList[String](syms.size)
        var j = 0
        while (j < syms.size) {
          if (j + 1 < syms.size && syms.get(j) == a && syms.get(j + 1) == b) {
            out.add(a + b); j += 2
          } else { out.add(syms.get(j)); j += 1 }
        }
        syms = out
        m += 1
      }
      val arr = new Array[AnyRef](syms.size)
      var k = 0
      while (k < syms.size) {
        arr(k) = UTF8String.fromString(syms.get(k))
        k += 1
      }
      new GenericArrayData(arr)
    }

    override def nullSafeEval(w: Any): Any =
      compute(w.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("bpeEncode", this,
        classOf[BpeEncode].getName)
      nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $self.compute($w);")
    }

    override protected def withNewChildInternal(c: Expression): BpeEncode =
      copy(child = c)

    override def prettyName: String = "bpe_encode"
  }

  def bpeEncode(word: Column, merges: Seq[(String, String)]): Column =
    GraftExprColumn.column(BpeEncode(GraftExprColumn.expression(word), merges))
}
