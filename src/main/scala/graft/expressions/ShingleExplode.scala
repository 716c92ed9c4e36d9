package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating expression (the UDTF leg of SURVEY §2.12, beside the
  * scalar kernels and the typed Aggregators): explodes a text column
  * DIRECTLY into one row per distinct n-word shingle, with its first-
  * occurrence position — `explode(shingle_tokens(text))` fused into one
  * generator, so the inverted-index pipelines (n-gram Jaccard,
  * decontamination, TF-IDF-style indexing) skip materializing the
  * intermediate array value between the kernel and the explode.
  *
  * Generators sit outside whole-stage codegen by design in Spark
  * (GenerateExec drives them row-by-row), hence CodegenFallback — the
  * shingling itself still runs the single-pass TextKernels byte scan.
  *
  * Output schema: (pos INT, shingle STRING NOT NULL); NULL/letterless
  * input generates zero rows (matching the kernel's empty-set rule).
  */
case class ShingleExplode(child: Expression, n: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback with Serializable {
  require(n >= 1, "shingle width >= 1")

  override def prettyName: String = s"shingle_explode$n"
  override val inline: Boolean = false
  override def position: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_explode needs a STRING input, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val arr: ArrayData = TextKernels.shingles(v.asInstanceOf[UTF8String], n)
      (0 until arr.numElements()).iterator.map { i =>
        InternalRow(i, arr.getUTF8String(i))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): ShingleExplode = copy(child = c)
}
