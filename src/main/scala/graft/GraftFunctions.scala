package graft

import graft.expressions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.FunctionBridge

/** SQL registration for the custom kernel expressions — `spark.sql` users
  * get the same operator surface as the Column API (SURVEY.md §7.3).
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
  import org.apache.spark.sql.types._

  // the kernel expressions declare no ExpectsInputTypes (AbstractDataType
  // is private[sql] in Spark 4), so coerce explicitly at the SQL boundary —
  // otherwise an interpreted eval over e.g. an INT literal (constant
  // folding!) ClassCastExceptions at planning time
  private def asD(e: Expression) = Cast(e, DoubleType)
  private def asL(e: Expression) = Cast(e, LongType)
  private def asS(e: Expression) = Cast(e, StringType)
  private def asAD(e: Expression) = Cast(e, ArrayType(DoubleType))

  private def asF(e: Expression) = Cast(e, FloatType)

  def registerAll(spark: SparkSession): Unit = {
    FunctionBridge.register(spark, "fma", es => Fma(asD(es(0)), asD(es(1)), asD(es(2))))
    FunctionBridge.register(spark, "fma_f32", es => FmaF32(asF(es(0)), asF(es(1)), asF(es(2))))
    FunctionBridge.register(spark, "int_pow", es => IntPow(asL(es(0)), asL(es(1))))
    FunctionBridge.register(spark, "int_floor_div", es => IntFloorDiv(asL(es(0)), asL(es(1))))
    FunctionBridge.register(spark, "find_str0", es => FindStr0(asS(es(0)), asS(es(1))))
    FunctionBridge.register(spark, "count_match", es => CountMatch(asS(es(0)), asS(es(1))))
    FunctionBridge.register(spark, "wrap_int8", es => WrapInt(asL(es(0)), 8))
    FunctionBridge.register(spark, "wrap_int16", es => WrapInt(asL(es(0)), 16))
    FunctionBridge.register(spark, "wrap_int32", es => WrapInt(asL(es(0)), 32))
    FunctionBridge.register(spark, "rolling_hash", es => RollingHash(asS(es(0))))
    FunctionBridge.register(spark, "simhash64", es => SimHash64(asS(es(0))))
    FunctionBridge.register(spark, "shingle_tokens", es => ShingleTokens(asS(es(0)), 3))
    FunctionBridge.register(spark, "minhash_sig", es => MinHashSig(asS(es(0)), 3, 32, 42L))
    FunctionBridge.register(spark, "cosine_sim", es => CosineSim(asAD(es(0)), asAD(es(1))))
    FunctionBridge.register(spark, "srp_sig", es => SrpSig(asAD(es(0)), 16, 7L))
  }
}
