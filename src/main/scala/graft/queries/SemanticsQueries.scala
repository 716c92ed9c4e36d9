package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Ordering/equality semantics pinning (SURVEY.md §2.9 — minarrow
  * `Array::compare_at` total order incl. null ordering, src/enums/array.rs:2357,
  * and NaN==NaN hash semantics, :2419) plus OLAP grouping-set completion.
  */
object SemanticsQueries {

  val defs: Seq[QueryDef] = Seq(

    // Null ordering pinned explicitly (Spark ASC default = NULLS FIRST,
    // DuckDB's = NULLS LAST — the oracle states it, the plan states it).
    QueryDef.sql(
      "q51_null_ordering",
      """SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_or_null
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY status_or_null NULLS FIRST, o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "P", lit(null)).otherwise(col("o_orderstatus")).as("status_or_null"))
        .orderBy(col("status_or_null").asc_nulls_first, col("o_orderkey"))
    },

    // NaN semantics: NaN groups as equal to itself and sorts greatest in
    // both engines (minarrow hashes NaN via to_bits → NaN==NaN).
    QueryDef.sql(
      "q52_nan_semantics",
      """SELECT CASE WHEN l_linenumber = 1 THEN CAST('nan' AS DOUBLE) ELSE l_discount END AS d,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem WHERE l_orderkey < 2000
        |GROUP BY 1 ORDER BY isnan(d), d""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).filter(col("l_orderkey") < 2000)
        .groupBy(when(col("l_linenumber") === 1, lit(Double.NaN)).otherwise(col("l_discount")).as("d"))
        .agg(count(lit(1)).as("n"))
        .orderBy(isnan(col("d")), col("d"))
    },

    // ROLLUP grouping sets with explicit grouping() markers — engine-layer
    // OLAP completion over the crosstab surface.
    QueryDef.sql(
      "q53_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty, CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("g_flag"), col("g_status"),
          col("sum_qty"), col("n"))
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }
,

    // CUBE grouping sets (all 4 combinations of the two keys).
    QueryDef.sql(
      "q68_cube_grouping",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("g_flag"), col("g_status"), col("n"))
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // Explicit GROUPING SETS (the general form ROLLUP/CUBE are sugar for):
    // an asymmetric set list no rollup/cube can express — (flag, status),
    // (status), () — via Spark 4's Dataset.groupingSets.
    QueryDef.sql(
      "q99_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  ROUND(SUM(l_extendedprice), 2) AS total, CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          round(sum(col("l_extendedprice")), 2).as("total"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("g_flag"), col("g_status"),
          col("total"), col("n"))
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // Percentile battery: exact interpolated quantiles (== DuckDB
    // quantile_cont), computed by the SCALE-SAFE two-pass shape
    // (ops/Percentiles): per-(group, distinct-value) counts + cumulative
    // bracketing — bounded state, unlike the built-in `percentile` which
    // buffers every row of a group (kept proven-equal in ScaleSpec).
    QueryDef.sql(
      "q69_percentiles",
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS p90,
        |  ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      graft.ops.Percentiles.exactPercentiles(
          Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
          Seq(0.25, 0.50, 0.90, 0.99), Seq("p25", "p50", "p90", "p99"))
        .select(col("l_returnflag"),
          round(col("p25"), 4).as("p25"), round(col("p50"), 4).as("p50"),
          round(col("p90"), 4).as("p90"), round(col("p99"), 4).as("p99"))
        .orderBy(col("l_returnflag"))
    },

    // Approximate-percentile twin of q69 — THE 100 TB default. Exact
    // `percentile` buffers every value per group (unbounded state);
    // approx_percentile keeps a bounded sketch (~accuracy*O(1) memory)
    // and partial-aggregates map-side. Sketch values are engine-specific,
    // so the GATE row checks the rank-error CONTRACT instead, without any
    // buffering aggregate: accuracy=10000 bounds rank error by N/10000,
    // and a returned value a occupies the 0-based rank interval
    // [#{v<a}, #{v≤a}−1] of its group — the guard asserts that interval
    // overlaps target ± 10×N/10000, computed from the same bounded
    // (key, value, count) frame q69's machinery uses (one map-side-
    // combined shuffle + a broadcast of the 4·|groups| probe values).
    // The oracle expects four literal-true booleans per group — a broken
    // sketch flips one and the hash compare catches it.
    QueryDef.sql(
      "q70_percentiles_approx",
      """SELECT l_returnflag, true AS ok_p25, true AS ok_p50, true AS ok_p90, true AS ok_p99
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ps = Seq(0.25, 0.50, 0.90, 0.99)
      val li = Tables.lineitem(s, d)
      val approx = li.groupBy(col("l_returnflag")).agg(
        count(col("l_extendedprice")).as("__n"),
        ps.map(p => expr(s"approx_percentile(l_extendedprice, $p, 10000)")
          .as(s"__a${(p * 100).toInt}")): _*)
      // melt to one probe row per (group, p): 4·|groups| rows, broadcast
      val probes = approx.select(col("l_returnflag"), col("__n"),
        explode(array(ps.map(p =>
          struct(lit(p).as("p"), col(s"__a${(p * 100).toInt}").as("a"))): _*)).as("pr"))
        .select(col("l_returnflag"), col("__n"), col("pr.p").as("__p"), col("pr.a").as("__a"))
      val counts = li.filter(col("l_extendedprice").isNotNull)
        .groupBy(col("l_returnflag"), col("l_extendedprice").as("__v"))
        .agg(count(lit(1)).as("__c"))
      val ranks = counts.join(broadcast(probes), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"), col("__p"), col("__a"), col("__n"))
        .agg(
          coalesce(sum(when(col("__v") < col("__a"), col("__c"))), lit(0L)).as("__cntLT"),
          coalesce(sum(when(col("__v") <= col("__a"), col("__c"))), lit(0L)).as("__cntLE"))
      val slack = greatest(lit(1.0), col("__n") * lit(10.0 / 10000))
      val t = (col("__n") - 1) * col("__p")
      val ok = col("__cntLT") <= t + slack && (col("__cntLE") - 1) >= t - slack
      val okAggs = ps.map(p =>
        max(when(col("__p") === p, col("__ok"))).as(s"ok_p${(p * 100).toInt}"))
      ranks.withColumn("__ok", ok)
        .groupBy(col("l_returnflag"))
        .agg(okAggs.head, okAggs.tail: _*)
        .orderBy(col("l_returnflag"))
    }
  )
}