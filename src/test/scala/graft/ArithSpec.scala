package graft

import graft.ops.Arith
import org.apache.spark.sql.functions._

/** Arithmetic kernel semantics (minarrow §2.1): dense vs masked paths,
  * null-on-div-zero, floor division toward −∞, per-width wrapping, FMA
  * single rounding.
  */
class ArithSpec extends SparkSpec {

  test("dense path: element-wise ops on non-null longs") {
    val df = twoLongs("a", "b", Seq(
      (Some(1L), Some(10L)), (Some(2L), Some(20L)), (Some(3L), Some(30L))))
    assert(col1[Long](df.select(Arith.add(col("a"), col("b")))) ===
      Seq(Some(11L), Some(22L), Some(33L)))
    assert(col1[Long](df.select(Arith.mul(col("a"), col("b")))) ===
      Seq(Some(10L), Some(40L), Some(90L)))
  }

  test("masked path: null propagation merges validity masks") {
    val df = twoLongs("a", "b", Seq(
      (Some(1L), Some(10L)), (None, Some(20L)), (Some(3L), None), (None, None)))
    assert(col1[Long](df.select(Arith.add(col("a"), col("b")))) ===
      Seq(Some(11L), None, None, None))
  }

  test("division by zero nullifies (masked semantics, operators.rs:27-29)") {
    val df = twoLongs("a", "b", Seq(
      (Some(10L), Some(2L)), (Some(10L), Some(0L)), (Some(-10L), Some(0L))))
    assert(col1[Double](df.select(Arith.div(col("a"), col("b")))) ===
      Seq(Some(5.0), None, None))
    assert(col1[Long](df.select(Arith.rem(col("a"), col("b")))) ===
      Seq(Some(0L), None, None))
  }

  test("remainder sign follows dividend (Rust %)") {
    val df = twoLongs("a", "b", Seq(
      (Some(7L), Some(3L)), (Some(-7L), Some(3L)), (Some(7L), Some(-3L))))
    assert(col1[Long](df.select(Arith.rem(col("a"), col("b")))) ===
      Seq(Some(1L), Some(-1L), Some(1L)))
  }

  test("integer floor division rounds toward -inf, null on zero (operators.rs:41-47)") {
    val df = twoLongs("a", "b", Seq(
      (Some(7L), Some(2L)), (Some(-7L), Some(2L)), (Some(7L), Some(-2L)),
      (Some(-7L), Some(-2L)), (Some(7L), Some(0L)), (None, Some(2L))))
    assert(col1[Long](df.select(Arith.floorDivI(col("a"), col("b")))) ===
      Seq(Some(3L), Some(-4L), Some(-4L), Some(3L), None, None))
  }

  test("per-width wrapping reproduces Rust wrapping_add/mul (std.rs:41)") {
    val df = twoLongs("a", "b", Seq(
      (Some(127L), Some(1L)),      // i8 overflow: 127+1 -> -128
      (Some(-128L), Some(-1L)),    // i8 underflow: -128-1 -> 127 via add
      (Some(100L), Some(100L)),    // i8: 200 wraps to -56
      (Some(32767L), Some(1L))))   // i16 overflow
    assert(col1[Long](df.select(Arith.wrappingAdd(col("a"), col("b"), 8))) ===
      Seq(Some(-128L), Some(127L), Some(-56L), Some(0L)))
    assert(col1[Long](df.select(Arith.wrappingAdd(col("a"), col("b"), 16))) ===
      Seq(Some(128L), Some(-129L), Some(200L), Some(-32768L)))
    assert(col1[Long](df.select(Arith.wrappingMul(col("a"), col("b"), 8))) ===
      Seq(Some(127L), Some(-128L), Some(16L), Some(-1L)))
  }

  test("fma single-rounds (differs from a*b+c double rounding)") {
    val df = doubles("x", Seq(Some(1.0)))
    val a = 0.1; val b = 10.0; val c = -1.0
    val got = col1[Double](df.select(Arith.fma(lit(a), lit(b), lit(c)))).head.get
    assert(got === Math.fma(a, b, c))
    // the fixture exists precisely because the two differ:
    assert(Math.fma(a, b, c) !== a * b + c)
  }

  test("f32 fma single-rounds at binary32 (dispatch.rs:389 f32 twin)") {
    val df = doubles("x", Seq(Some(1.0)))
    // a = b = 1 + 2^-12: the exact square 1 + 2^-11 + 2^-24 needs 25 bits,
    // so f32 mul-then-add loses the 2^-24 tail that fma keeps
    val a = 1.0f + math.pow(2, -12).toFloat
    val c = -1.0f
    val got = col1[Float](df.select(Arith.fmaF32(lit(a), lit(a), lit(c)))).head.get
    assert(got === Math.fma(a, a, c))
    assert(Math.fma(a, a, c) !== a * a + c, "fixture must distinguish single from double rounding")
    // the emulated twin (what the oracle-checked gate columns use) matches
    // the kernel here, but NOT universally — fused fma and f64 emulation
    // can differ by one ulp on product-midpoint inputs (KernelLaws pins a
    // counterexample), which is why the gate never compares the fused form
    val emul = col1[Float](df.select(Arith.fmaF32Emulated(lit(a), lit(a), lit(c)))).head.get
    assert(emul === (a.toDouble * a.toDouble + c.toDouble).toFloat)
  }

  test("int pow wraps mod 2^64 like Rust release i64::pow (std.rs:67)") {
    import graft.expressions.StrKernels.intPow
    assert(intPow(7L, 3L) === 343L)
    assert(intPow(5L, 0L) === 1L)
    // out-of-u32-range exponent coerces to 0 -> result 1 (to_u32().unwrap_or(0))
    assert(intPow(9L, -2L) === 1L)
    assert(intPow(9L, 0x100000000L) === 1L)
    // overflow wraps mod 2^64 — compare against BigInt residue
    val expect = (BigInt(3).pow(41) mod (BigInt(1) << 64)).toLong
    assert(intPow(3L, 41L) === expect)
    // expression end-to-end through codegen
    val df = twoLongs("a", "b", Seq((Some(3L), Some(41L)), (Some(2L), Some(200L)), (None, Some(2L))))
    assert(col1[Long](df.select(Arith.powerInt(col("a"), col("b")))) ===
      Seq(Some(expect), Some((BigInt(2).pow(200) mod (BigInt(1) << 64)).toLong), None))
  }

  test("float floor div + power") {
    val df = doubles("x", Seq(Some(7.5), Some(-7.5)))
    assert(col1[Long](df.select(Arith.floorDivF(col("x"), lit(2.0)))) ===
      Seq(Some(3L), Some(-4L)))
    assert(col1[Double](df.select(Arith.power(col("x"), lit(2.0)))) ===
      Seq(Some(56.25), Some(56.25)))
  }

  test("int+float promotes to float (routing/arithmetic.rs:225)") {
    val df = twoLongs("a", "b", Seq((Some(3L), Some(0L))))
    val out = df.select(Arith.add(col("a"), lit(0.5)))
    assert(out.schema.head.dataType.typeName === "double")
    assert(col1[Double](out) === Seq(Some(3.5)))
  }
}
