package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Sum of UNSIGNED byte values of a binary payload — the checksum/mass
  * statistic for raw media planes (gray8 pixel buffers, PCM frames),
  * where no builtin exists (Spark has no HOFs over BinaryType). One tight
  * loop, whole-stage-codegen'd.
  */
case class ByteSum(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_sum"
  override protected def nullSafeEval(v: Any): Any =
    ByteSum.sum(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.ByteSum.sum($v)")
  override protected def withNewChildInternal(c: Expression): ByteSum = copy(child = c)
}

object ByteSum {
  def sum(b: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < b.length) { s += (b(i) & 0xff); i += 1 }
    s
  }
}
