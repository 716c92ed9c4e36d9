package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over whitespace tokens: each token contributes ±1 to 64
  * bit-counters (weighted by nothing — unweighted Charikar simhash); the
  * signature's bit i is 1 iff counter i > 0. Near-duplicate documents have
  * signatures within a small Hamming distance.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(v: Any): Any =
    StrKernels.simHash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.StrKernels.simHash64($v)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}
