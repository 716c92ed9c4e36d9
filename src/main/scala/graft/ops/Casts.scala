package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The minarrow casting matrix (src/conversions.rs:15-45, SURVEY.md §1.2):
  * widening via `From` (always succeeds), checked narrowing via `TryFrom`
  * (→ NULL under masked semantics), strict float→int (finite + exact only),
  * bool↔numeric, numeric→string, and the unsigned-width policy
  * (u64 → Decimal(20,0): Spark has no unsigned types).
  */
object Casts {

  /** Widening int→int/float (`From` impls — infallible). */
  def widen(c: Column, to: String): Column = c.cast(to)

  /** f64→f32 narrowing (IEEE round-to-nearest — the reference's
    * Float64→Float32 cast); f32→f64 widening is exact via widen(_, "double").
    */
  def narrowToF32(c: Column): Column = c.cast("float")

  /** Checked narrowing (`TryFrom` → Overflow error; masked semantics → NULL
    * when out of range). Spark non-ANSI cast wraps, so range-check first.
    */
  def narrowChecked(c: Column, to: String): Column = {
    val (lo, hi) = to match {
      case "tinyint" | "byte"   => (Byte.MinValue.toLong, Byte.MaxValue.toLong)
      case "smallint" | "short" => (Short.MinValue.toLong, Short.MaxValue.toLong)
      case "int" | "integer"    => (Int.MinValue.toLong, Int.MaxValue.toLong)
      case other => throw new IllegalArgumentException(s"narrow to $other")
    }
    when(c.between(lo, hi), c.cast(to))
  }

  /** Strict float→int (conversions.rs: finite + exact truncation only;
    * fractional or non-finite → NULL under masked semantics).
    */
  def floatToIntStrict(c: Column): Column =
    when(c === floor(c) && !c.isNaN &&
      c >= -9.223372036854776e18 && c < 9.223372036854776e18, // Long range: beyond it, cast saturates instead of nullifying
      c.cast("long"))

  /** bool→numeric: true→1, false→0. */
  def boolToInt(c: Column): Column = c.cast("long")

  /** numeric→bool: non-zero → true. */
  def intToBool(c: Column): Column = c =!= 0

  /** numeric→string (Rust ryu-adjacent; Spark uses Java Double.toString —
    * equal for typical magnitudes, divergent in exponent notation corners).
    */
  def numToString(c: Column): Column = c.cast("string")

  /** string→numeric, NULL on unparseable (masked semantics). */
  def stringToLong(c: Column): Column = c.cast("long")
  def stringToDouble(c: Column): Column = c.cast("double")

  /** u64 policy: unsigned 64-bit values live in Decimal(20,0)
    * (SURVEY.md §1.1 IntegerArray row — Spark has no unsigned types).
    */
  def toU64(c: Column): Column = c.cast("decimal(20,0)")

  /** Datetime width i32↔i64 / unit changes are Datetime.fromEpoch /
    * castTimeUnit (ops/Datetime.scala); string↔categorical is a no-op in
    * Spark's model (dictionary encoding is physical, SURVEY.md §7.4.3).
    */
}
