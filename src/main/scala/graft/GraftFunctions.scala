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

  /** The full kernel-function table — consumed by both the per-session
    * `registerAll` and the `GraftExtensions` injection path.
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fma" -> (es => Fma(asD(es(0)), asD(es(1)), asD(es(2)))),
    "fma_f32" -> (es => FmaF32(asF(es(0)), asF(es(1)), asF(es(2)))),
    "int_pow" -> (es => IntPow(asL(es(0)), asL(es(1)))),
    "int_floor_div" -> (es => IntFloorDiv(asL(es(0)), asL(es(1)))),
    "find_str0" -> (es => FindStr0(asS(es(0)), asS(es(1)))),
    "count_match" -> (es => CountMatch(asS(es(0)), asS(es(1)))),
    "str_subtract" -> (es => StrSubtract(asS(es(0)), asS(es(1)))),
    "str_divide" -> (es => StrDivide(asS(es(0)), asS(es(1)))),
    "str_multiply" -> (es => StrMulLen(asS(es(0)), asS(es(1)))),
    "wrap_int8" -> (es => WrapInt(asL(es(0)), 8)),
    "wrap_int16" -> (es => WrapInt(asL(es(0)), 16)),
    "wrap_int32" -> (es => WrapInt(asL(es(0)), 32)),
    "rolling_hash" -> (es => RollingHash(asS(es(0)))),
    "simhash64" -> (es => SimHash64(asS(es(0)))),
    "shingle_tokens" -> (es => ShingleTokens(asS(es(0)), 3)),
    "minhash_sig" -> (es => MinHashSig(asS(es(0)), 3, 32, 42L)),
    "cosine_sim" -> (es => CosineSim(asAD(es(0)), asAD(es(1)))),
    "srp_sig" -> (es => SrpSig(asAD(es(0)), 16, 7L)),
    "nfc_normalize" -> (es => NfcNormalize(asS(es(0)))),
    "strip_accents" -> (es => StripAccents(asS(es(0)))),
    "text_stats" -> (es => TextStats(asS(es(0)), graft.llm.TextAnalysis.StopEn)),
    "repetition_stats" -> (es => RepetitionStats(asS(es(0)))),
    // table-generating (UDTF): SELECT shingle_explode(text) — LATERAL VIEW
    // compatible; fixed 3-gram width on the SQL surface like shingle_tokens
    "shingle_explode" -> (es => ShingleExplode(asS(es(0)), 3)))

  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => FunctionBridge.register(spark, name, b) }
}
