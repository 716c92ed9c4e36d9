package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable 64-bit SimHash (md5 bit source — see
  * StrKernels.simHashMd5): the codegen kernel behind the oracle-checked
  * q34 pair query. Same Charikar fold as [[SimHash64]]; the md5 basis is
  * what a SQL oracle can replay digit-for-digit, where splitmix64/FNV
  * wrapping arithmetic cannot be expressed engine-neutrally.
  */
case class SimHashMd5(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"
  override protected def nullSafeEval(v: Any): Any =
    StrKernels.simHashMd5(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.StrKernels.simHashMd5($v)")
  override protected def withNewChildInternal(c: Expression): SimHashMd5 = copy(child = c)
}
