package graft.ops

import graft.expressions.{Fma, FmaF32, IntFloorDiv, IntPow, WrapInt}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

/** Element-wise arithmetic surface (minarrow `ArithmeticOperator`:
  * Add/Subtract/Multiply/Divide/Remainder/Power/FloorDiv,
  * src/enums/operators.rs:19-48; dispatch src/kernels/arithmetic/dispatch.rs).
  *
  * Semantics choices (SURVEY.md §7.4):
  *  - masked semantics everywhere: division/remainder by zero → NULL
  *    (minarrow's masked path, src/enums/operators.rs:27-29) — Spark's
  *    non-ANSI `/` and `%` already do exactly this;
  *  - mixed int⊕float promotes to float (src/kernels/routing/arithmetic.rs:225+) —
  *    Spark's numeric coercion does the same widening;
  *  - per-width wrapping (src/kernels/arithmetic/std.rs:41) via `wrapInt`;
  *  - FloorDiv rounds toward −∞ (src/enums/operators.rs:41-47): floats via
  *    `floor(a/b)`, ints via the sign-correct `IntFloorDiv` expression;
  *  - FMA single-rounds (src/kernels/arithmetic/dispatch.rs:404).
  *
  * Everything here is a Catalyst expression → whole-stage-codegen'd,
  * shuffle-free, and executes per-partition at any scale.
  */
object Arith {
  def add(a: Column, b: Column): Column = a + b
  def sub(a: Column, b: Column): Column = a - b
  def mul(a: Column, b: Column): Column = a * b

  /** Divide, NULL on zero divisor (masked semantics). */
  def div(a: Column, b: Column): Column = a / b

  /** Remainder, sign follows the dividend (Rust `%`), NULL on zero divisor. */
  def rem(a: Column, b: Column): Column = a % b

  /** Power via double `pow` (the float path — src/enums/operators.rs:36-39). */
  def power(a: Column, b: Column): Column = pow(a, b)

  /** Integer power with the reference's exact semantics: wrapping repeated
    * multiplication mod 2^64, exponent `to_u32().unwrap_or(0)`
    * (std.rs:67) — the int-pow twin of the float `power` lane.
    */
  def powerInt(a: Column, b: Column): Column =
    toCol(IntPow(toExpr(a.cast("long")), toExpr(b.cast("long"))))

  /** Floor division for floating point: floor(a/b), NULL on zero divisor. */
  def floorDivF(a: Column, b: Column): Column = floor(a / b)

  /** Floor division for integers: rounds toward −∞, NULL on zero divisor. */
  def floorDivI(a: Column, b: Column): Column =
    toCol(IntFloorDiv(toExpr(a.cast("long")), toExpr(b.cast("long"))))

  /** Fused multiply-add a*b + c with single rounding. */
  def fma(a: Column, b: Column, c: Column): Column =
    toCol(Fma(toExpr(a.cast("double")), toExpr(b.cast("double")), toExpr(c.cast("double"))))

  /** f32 twin: single-rounded fma at BINARY32 precision (dispatch.rs:389)
    * — true hardware fused multiply-add, reference-parity semantics.
    *
    * NOT cross-engine oracle-safe: emulating it in binary64 double-rounds,
    * and the 2p+2 double-rounding theorem does NOT cover fma (the product
    * is 2p bits; counterexample 24929f*673f + 2^-30f → fused 16777218f vs
    * emulated 16777216f). Engines without a real fma therefore can't
    * reproduce it bit-exactly — use `fmaF32Emulated` where cross-engine
    * reproducibility matters more than the fused semantics.
    */
  def fmaF32(a: Column, b: Column, c: Column): Column =
    toCol(FmaF32(toExpr(a.cast("float")), toExpr(b.cast("float")), toExpr(c.cast("float"))))

  /** Deterministic-everywhere f32 mul-add: compute in binary64, round once
    * to binary32. Differs from the fused form by at most one f32 ulp, and
    * every IEEE engine produces the identical bit pattern — the form the
    * oracle-checked gate columns use.
    */
  def fmaF32Emulated(a: Column, b: Column, c: Column): Column =
    (a.cast("float").cast("double") * b.cast("float").cast("double") +
      c.cast("float").cast("double")).cast("float")

  /** f32 lane entry: cast to IEEE binary32 (strict narrowing to the
    * reference's Float32 kernels' input type).
    */
  def toF32(c: Column): Column = c.cast("float")

  /** Wrap a 64-bit intermediate to a `bits`-wide signed integer — reproduces
    * Rust per-width wrapping arithmetic for any +,-,* chain computed in Long.
    */
  def wrapInt(a: Column, bits: Int): Column = toCol(WrapInt(toExpr(a.cast("long")), bits))

  def wrappingAdd(a: Column, b: Column, bits: Int): Column = wrapInt(a + b, bits)
  def wrappingSub(a: Column, b: Column, bits: Int): Column = wrapInt(a - b, bits)
  def wrappingMul(a: Column, b: Column, bits: Int): Column = wrapInt(a * b, bits)

  def negative(a: Column): Column = -a
  def positive(a: Column): Column = a
  def absVal(a: Column): Column = abs(a)
}
