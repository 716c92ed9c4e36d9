package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** ANN index-build kernels. The HOF formulations (an argmax/argmin fold
  * over a literal array of k struct expressions) are correct but run
  * INTERPRETED and embed the whole codebook in the expression tree — at a
  * production cell count (k ≈ 1024+) that is megabytes of plan and k
  * lambda dispatches per row. Here the codebook rides the codegen
  * reference registry (`addReferenceObj`) and each row is one tight JVM
  * loop; operation order matches the HOF forms exactly (same cosineSim
  * fold, same strict-compare first-wins ties), so outputs are
  * bit-identical — LlmSpec's full-probe == brute-force and
  * IVF-PQ == flat-PQ identities pin that.
  */
object AnnKernels {

  /** Argmax-cosine cell id; ties keep the earliest cell. NULL/zero-norm
    * inputs land in cell 0 (the HOF form's coalesce(cosine, -2.0)
    * contract: such vectors must still land in SOME cell).
    */
  def nearestCentroid(vec: ArrayData, cents: Array[Array[Double]]): Int = {
    var best = -1
    var bestD = Double.MinValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val n = math.min(vec.numElements(), c.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < n) {
        val x = vec.getDouble(j); val y = c(j)
        dot += x * y; na += x * x; nb += y * y
        j += 1
      }
      val d = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      if (d > bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** PQ codes: per subspace, the index of the L2-nearest sub-centroid
    * (strict-compare argmin, earliest wins). Input must be the normalized
    * vector (the caller's l2Normalize projection).
    */
  def pqEncode(vec: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    // UnsafeArrayData.getDouble does NOT bounds-check: a vector shorter
    // than the codebook dimensionality would read out-of-bounds memory
    // and emit silently wrong codes. Dimension mismatches must fail loud.
    if (vec.numElements() < m * sub)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${vec.numElements()} elements, codebooks need ${m * sub}")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = codebooks(s)
      var best = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var dd = 0.0
        var j = 0
        while (j < sub) {
          val x = vec.getDouble(s * sub + j) - cents(c)(j)
          dd += x * x
          j += 1
        }
        if (dd < bestD) { bestD = dd; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Nearest-IVF-cell id of an `array<double>` vector; the centroid table
  * is a codegen reference object, not a plan literal. Callers map NULL
  * vectors to an EMPTY array first (zero elements → every cosine 0.0 →
  * cell 0), preserving the every-vector-lands-in-some-cell contract on
  * the standard null-safe path.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  override protected def nullSafeEval(v: Any): Any =
    AnnKernels.nearestCentroid(v.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.expressions.AnnKernels.nearestCentroid($v, $cents)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

/** PQ code array of a NORMALIZED `array<double>` vector; codebooks ride
  * the codegen reference registry.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(v: Any): Any =
    AnnKernels.pqEncode(v.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbs = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, v => s"graft.expressions.AnnKernels.pqEncode($v, $cbs)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}
