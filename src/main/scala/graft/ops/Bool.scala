package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Boolean / bitmask kernel surface (minarrow src/kernels/bitmask/,
  * SURVEY.md §2.2: and/or/xor/not masks, in/not-in membership, eq/ne,
  * popcount, all_true/all_false) plus the declared-but-delegated comparison
  * surface (`ComparisonOperator`, src/enums/operators.rs:52-85).
  *
  * Bitmask representation is Spark's null/boolean vector — we reproduce
  * the *predicate algebra*, Tungsten owns the bits.
  */
object Bool {
  // and_masks/or_masks/xor_masks/not_mask, bitmask/dispatch.rs:96-135
  def andMask(a: Column, b: Column): Column = a && b
  def orMask(a: Column, b: Column): Column = a || b
  def xorMask(a: Column, b: Column): Column = a =!= b
  def notMask(a: Column): Column = !a

  // in_mask / not_in_mask, dispatch.rs:150,163
  def inMask(c: Column, values: Seq[Any]): Column = c.isin(values: _*)
  def notInMask(c: Column, values: Seq[Any]): Column = !c.isin(values: _*)

  // eq/ne masks, dispatch.rs:178,191
  def eqMask(a: Column, b: Column): Column = a === b
  def neMask(a: Column, b: Column): Column = a =!= b

  // comparison surface (operators.rs:52-85 — kernels live downstream in the
  // reference's ecosystem; full surface implemented here as builtins)
  def lt(a: Column, b: Column): Column = a < b
  def le(a: Column, b: Column): Column = a <= b
  def gt(a: Column, b: Column): Column = a > b
  def ge(a: Column, b: Column): Column = a >= b
  def isNullMask(c: Column): Column = c.isNull
  def isNotNullMask(c: Column): Column = c.isNotNull
  def betweenMask(c: Column, lo: Any, hi: Any): Column = c.between(lo, hi)

  // popcount_mask, dispatch.rs:258 — aggregation
  def popcount(mask: Column): Column = count_if(mask)

  // all_true_mask / all_false_mask, dispatch.rs:273,286 — aggregations
  def allTrue(mask: Column): Column = bool_and(mask)
  def anyTrue(mask: Column): Column = bool_or(mask)
  def allFalse(mask: Column): Column = bool_and(!mask)

  // all_eq / all_ne, dispatch.rs:204,217
  def allEq(a: Column, b: Column): Column = bool_and(a === b)
  def allNe(a: Column, b: Column): Column = bool_and(a =!= b)
}
