package graft

import graft.expressions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.FunctionBridge

/** SQL registration for the custom kernel expressions — `spark.sql` users
  * get the same operator surface as the Column API (SURVEY.md §7.3).
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    FunctionBridge.register(spark, "fma", es => Fma(es(0), es(1), es(2)))
    FunctionBridge.register(spark, "int_floor_div", es => IntFloorDiv(es(0), es(1)))
    FunctionBridge.register(spark, "find_str0", es => FindStr0(es(0), es(1)))
    FunctionBridge.register(spark, "count_match", es => CountMatch(es(0), es(1)))
    FunctionBridge.register(spark, "wrap_int8", es => WrapInt(es(0), 8))
    FunctionBridge.register(spark, "wrap_int16", es => WrapInt(es(0), 16))
    FunctionBridge.register(spark, "wrap_int32", es => WrapInt(es(0), 32))
    FunctionBridge.register(spark, "rolling_hash", es => RollingHash(es(0)))
    FunctionBridge.register(spark, "simhash64", es => SimHash64(es(0)))
    FunctionBridge.register(spark, "shingle_tokens", es => ShingleTokens(es(0), 3))
    FunctionBridge.register(spark, "minhash_sig", es => MinHashSig(es(0), 3, 32, 42L))
    FunctionBridge.register(spark, "cosine_sim", es => CosineSim(es(0), es(1)))
    FunctionBridge.register(spark, "srp_sig", es => SrpSig(es(0), 16, 7L))
  }
}
