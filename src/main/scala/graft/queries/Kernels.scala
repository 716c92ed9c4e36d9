package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Arith, Bool}
import org.apache.spark.sql.functions._

/** Arithmetic + boolean kernel queries (SURVEY.md §2.1, §2.2) — each column
  * is one minarrow kernel applied across the lineitem fact table, checked
  * value-exactly against DuckDB.
  */
object Kernels {

  val defs: Seq[QueryDef] = Seq(

    // Element-wise arithmetic incl. masked div-by-zero → NULL semantics
    // (minarrow src/enums/operators.rs:27-29).
    QueryDef.sql(
      "q13_arith_elementwise",
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity + l_tax AS add_qt,
        |  l_extendedprice - l_quantity AS sub_pq,
        |  l_extendedprice * l_discount AS mul_pd,
        |  l_extendedprice / l_quantity AS div_pq,
        |  CAST(l_orderkey % 7 AS BIGINT) AS rem_o7,
        |  ROUND(power(1 + l_discount, 2), 4) AS pow_d2,
        |  CAST(floor(l_extendedprice / (l_quantity + 1)) AS BIGINT) AS fdiv_f,
        |  l_extendedprice / (l_quantity - l_quantity) AS div_zero,
        |  CAST(power(l_linenumber, 3) AS BIGINT) AS ipow_l3
        |FROM lineitem WHERE l_orderkey < 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") < 2000)
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        Arith.add(col("l_quantity"), col("l_tax")).as("add_qt"),
        Arith.sub(col("l_extendedprice"), col("l_quantity")).as("sub_pq"),
        Arith.mul(col("l_extendedprice"), col("l_discount")).as("mul_pd"),
        Arith.div(col("l_extendedprice"), col("l_quantity")).as("div_pq"),
        Arith.rem(col("l_orderkey"), lit(7)).cast("long").as("rem_o7"),
        round(Arith.power(lit(1) + col("l_discount"), lit(2)), 4).as("pow_d2"),
        Arith.floorDivF(col("l_extendedprice"), col("l_quantity") + 1).cast("long").as("fdiv_f"),
        Arith.div(col("l_extendedprice"), col("l_quantity") - col("l_quantity")).as("div_zero"),
        // int-pow lane: wrapping repeated multiplication (std.rs:67);
        // in-range here so the double-pow oracle is exact
        Arith.powerInt(col("l_linenumber"), lit(3)).as("ipow_l3"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Sign-correct integer floor division (custom IntFloorDiv expression),
    // per-width wrapping (WrapInt), single-rounding FMA (Fma + FmaF32).
    // The f32 lane (add32/mul32/div32/promo32/fma32) runs at true IEEE
    // binary32 on both engines (Spark FloatType == DuckDB REAL arithmetic);
    // add/mul are native f32, div is double-rounded f64->f32 (safe by the
    // 2p+2 theorem, which covers +,-,/ — NOT fma), and fma32 is the
    // EMULATED double-then-float form on both sides: bit-identical across
    // engines by construction. The true fused kernel (FmaF32) is
    // reference-parity-tested in ArithSpec; an oracle can't express it.
    QueryDef.sql(
      "q14_floordiv_wrap_fma",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor((l_orderkey - 2 * l_partkey) / CAST(l_linenumber AS DOUBLE)) AS BIGINT) AS fdiv_i,
        |  CAST((((l_orderkey * l_suppkey + l_partkey) % 256) + 256 + 128) % 256 - 128 AS BIGINT) AS wrap8,
        |  CAST((((l_orderkey * l_suppkey + l_partkey) % 65536) + 65536 + 32768) % 65536 - 32768 AS BIGINT) AS wrap16,
        |  ROUND(l_quantity * l_discount + l_tax, 6) AS fma_qdt,
        |  CAST(l_quantity AS REAL) + CAST(l_tax AS REAL) AS add32,
        |  CAST(l_extendedprice AS REAL) * CAST(l_discount AS REAL) AS mul32,
        |  CAST(l_extendedprice AS REAL) / CAST(l_quantity AS REAL) AS div32,
        |  l_linenumber + CAST(l_discount AS REAL) AS promo32,
        |  CAST(CAST(CAST(l_quantity AS REAL) AS DOUBLE) * CAST(CAST(l_discount AS REAL) AS DOUBLE)
        |       + CAST(CAST(l_tax AS REAL) AS DOUBLE) AS REAL) AS fma32
        |FROM lineitem WHERE l_orderkey < 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") < 2000)
      val wrapSrc = col("l_orderkey") * col("l_suppkey") + col("l_partkey")
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        Arith.floorDivI(col("l_orderkey") - lit(2) * col("l_partkey"), col("l_linenumber")).as("fdiv_i"),
        Arith.wrapInt(wrapSrc, 8).as("wrap8"),
        Arith.wrapInt(wrapSrc, 16).as("wrap16"),
        round(Arith.fma(col("l_quantity"), col("l_discount"), col("l_tax")), 6).as("fma_qdt"),
        (Arith.toF32(col("l_quantity")) + Arith.toF32(col("l_tax"))).as("add32"),
        (Arith.toF32(col("l_extendedprice")) * Arith.toF32(col("l_discount"))).as("mul32"),
        // Spark Divide always computes in double; one f32 rounding of the
        // f64 quotient equals direct f32 division (2p+2 theorem)
        (Arith.toF32(col("l_extendedprice")) / Arith.toF32(col("l_quantity"))).cast("float").as("div32"),
        (col("l_linenumber") + Arith.toF32(col("l_discount"))).as("promo32"),
        Arith.fmaF32Emulated(col("l_quantity"), col("l_discount"), col("l_tax")).as("fma32"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Boolean mask algebra + popcount/all_true/any_true reductions
    // (minarrow src/kernels/bitmask/dispatch.rs:96-286).
    QueryDef.sql(
      "q15_bool_masks",
      """SELECT l_returnflag,
        |  CAST(COUNT(CASE WHEN l_quantity > 25 AND l_discount > 0.05 THEN 1 END) AS BIGINT) AS n_and,
        |  CAST(COUNT(CASE WHEN l_quantity > 25 OR l_discount > 0.05 THEN 1 END) AS BIGINT) AS n_or,
        |  CAST(COUNT(CASE WHEN (l_quantity > 25) <> (l_discount > 0.05) THEN 1 END) AS BIGINT) AS n_xor,
        |  CAST(COUNT(CASE WHEN NOT (l_quantity > 25) THEN 1 END) AS BIGINT) AS n_not,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_quantity > 49) AS any_big
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val a = col("l_quantity") > 25
      val b = col("l_discount") > 0.05
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          Bool.popcount(Bool.andMask(a, b)).as("n_and"),
          Bool.popcount(Bool.orMask(a, b)).as("n_or"),
          Bool.popcount(Bool.xorMask(a, b)).as("n_xor"),
          Bool.popcount(Bool.notMask(a)).as("n_not"),
          Bool.allTrue(col("l_quantity") > 0).as("all_pos"),
          Bool.anyTrue(col("l_quantity") > 49).as("any_big"))
        .orderBy(col("l_returnflag"))
    },

    // Membership + range predicates (in_mask/not_in_mask dispatch.rs:150,163;
    // Between operators.rs:52-85).
    QueryDef.sql(
      "q16_membership",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |WHERE o_orderstatus IN ('F', 'P')
        |  AND o_totalprice BETWEEN 50000 AND 150000
        |  AND o_orderpriority NOT IN ('1-URGENT')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(Bool.inMask(col("o_orderstatus"), Seq("F", "P")) &&
          Bool.betweenMask(col("o_totalprice"), 50000, 150000) &&
          Bool.notInMask(col("o_orderpriority"), Seq("1-URGENT")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }
  )
}
