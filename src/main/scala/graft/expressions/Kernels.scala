package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the minarrow kernel semantics Spark's
  * builtins don't reproduce bit-for-bit (SURVEY.md §7.3). All are
  * codegen'd (no CodegenFallback) so they stay inside whole-stage codegen
  * in the hot path.
  */

/** Fused multiply-add `a*b + c` with a single rounding step.
  * Reference: minarrow `apply_fma_f32/f64`, src/kernels/arithmetic/dispatch.rs:404
  * (std bodies src/kernels/arithmetic/std.rs:198,225). Spark has no fma
  * builtin; `a*b + c` double-rounds.
  */
case class Fma(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fma"
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    Math.fma(a.asInstanceOf[Double], b.asInstanceOf[Double], c.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"java.lang.Math.fma($a, $b, $c)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Fma = copy(f, s, t)
}

/** Float32 twin of Fma — single-rounded fma at BINARY32 precision
  * (minarrow apply_fma_f32, src/kernels/arithmetic/dispatch.rs:389-419).
  * Math.fma(float,float,float) is the hardware single-precision FMA; the
  * double-path Fma then a float cast would round twice.
  */
case class FmaF32(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {
  override def dataType: DataType = FloatType
  override def prettyName: String = "fma_f32"
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    Math.fma(a.asInstanceOf[Float], b.asInstanceOf[Float], c.asInstanceOf[Float])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"java.lang.Math.fma($a, $b, $c)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): FmaF32 = copy(f, s, t)
}

/** Wrapping integer power — the reference's integer Power path
  * (`lhs.pow(rhs.to_u32().unwrap_or(0))`, src/kernels/arithmetic/std.rs:67):
  * multiplication mod 2^64 (Rust release wrapping), out-of-u32-range
  * exponent → 0 → result 1. Completes operator parity with the float-pow
  * lane (`Arith.power`).
  */
case class IntPow(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "int_pow"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StrKernels.intPow(l.asInstanceOf[Long], r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.expressions.StrKernels.intPow($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntPow =
    copy(l, r)
}

/** Integer floor division: rounds toward negative infinity, NULL on zero
  * divisor (minarrow's masked-path semantics: FloorDiv
  * src/enums/operators.rs:41-47; div-by-zero nullify src/enums/operators.rs:27-29).
  * Spark's `div` truncates toward zero; `floor(a/b)` goes through doubles.
  */
case class IntFloorDiv(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_floor_div"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val rv = r.asInstanceOf[Long]
    if (rv == 0L) null else Math.floorDiv(l.asInstanceOf[Long], rv)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""
         |if ($r == 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = java.lang.Math.floorDiv($l, $r);
         |}
       """.stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntFloorDiv =
    copy(l, r)
}

/** 0-based byte offset of the first occurrence of `substr` in `str`;
  * NULL when absent. Reference: minarrow `find_str` (byte-offset semantics),
  * src/kernels/string.rs:1322. Spark's `instr`/`locate` are 1-based and
  * character-based.
  */
case class FindStr0(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "find_str0"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val idx = StrKernels.indexOfBytes(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    if (idx < 0) null else idx
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.freshName("graftIdx")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""
         |long $idx = graft.expressions.StrKernels.indexOfBytes($l, $r);
         |if ($idx < 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $idx;
         |}
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FindStr0 =
    copy(l, r)
}

/** Count of non-overlapping occurrences of literal `substr` in `str`.
  * Reference: minarrow `count_match_str`, src/kernels/string.rs:1388.
  * Empty pattern counts char boundaries (chars + 1), the Rust
  * `str::matches("")` behavior the reference inherits.
  */
case class CountMatch(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "count_match"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StrKernels.countMatch(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.expressions.StrKernels.countMatch($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMatch =
    copy(l, r)
}

/** str − str: remove the FIRST occurrence of `right` from `left` (minarrow
  * apply_str_str Subtract, src/kernels/arithmetic/string.rs:740; pinned by
  * test_subtract_str :1625 — "goodbye" − "bye" = "good").
  */
case class StrSubtract(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def prettyName: String = "str_subtract"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StrKernels.subtractFirst(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.expressions.StrKernels.subtractFirst($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StrSubtract =
    copy(l, r)
}

/** str ÷ str: split `left` on non-overlapping occurrences of `right` and
  * rejoin with '|'; empty separator → unchanged (minarrow apply_str_str
  * Divide, src/kernels/arithmetic/string.rs:757; test_divide_str :1689 —
  * "a--b--c" ÷ "--" = "a|b|c").
  */
case class StrDivide(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def prettyName: String = "str_divide"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StrKernels.divideSep(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.expressions.StrKernels.divideSep($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StrDivide =
    copy(l, r)
}

/** str × str: `left` repeated by the BYTE length of `right`, capped at
  * STRING_MULTIPLICATION_LIMIT = 1e6 (minarrow apply_str_str Multiply,
  * src/kernels/arithmetic/string.rs:71,751; test_multiply_str :1654 —
  * "x" × "123" = "xxx").
  */
case class StrMulLen(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def prettyName: String = "str_multiply"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StrKernels.multiplyByLen(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.expressions.StrKernels.multiplyByLen($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StrMulLen =
    copy(l, r)
}

/** Reinterpret a 64-bit value as a wrapped `bits`-wide signed integer —
  * minarrow integer arithmetic wraps per-width (`WrappingAdd/Sub/Mul`,
  * src/kernels/arithmetic/std.rs:41). Computing in Long then wrapping the
  * result reproduces Rust's wrapping add/sub/mul at any width < 64 because
  * wrapping is a ring homomorphism (mod 2^bits of the exact sum == wrapped
  * sum of wrapped inputs).
  */
case class WrapInt(child: Expression, bits: Int)
    extends UnaryExpression with Serializable {
  require(bits == 8 || bits == 16 || bits == 32, s"unsupported width $bits")
  override def dataType: DataType = LongType
  override def prettyName: String = s"wrap_int$bits"
  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Long]
    bits match {
      case 8  => x.toByte.toLong
      case 16 => x.toShort.toLong
      case 32 => x.toInt.toLong
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cast = bits match {
      case 8 => "(byte)"; case 16 => "(short)"; case 32 => "(int)"
    }
    defineCodeGen(ctx, ev, v => s"(long)($cast($v))")
  }
  override protected def withNewChildInternal(c: Expression): WrapInt = copy(child = c)
}

/** Polynomial rolling hash over UTF-8 bytes (base 257, mod 2^61-1) — a
  * deterministic document fingerprint for the text-analysis surface
  * (north-star extension; exact-hash analog of minarrow's
  * `hash_element_at`, src/enums/array.rs:2419).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override protected def nullSafeEval(v: Any): Any =
    StrKernels.rollingHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.StrKernels.rollingHash($v)")
  override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
}
