package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface: the engine-layer operators minarrow explicitly
  * delegates to the host engine (SURVEY.md §2.6, §2.9 — no group-by, join,
  * sort or set-op kernels exist in the reference; building blocks only:
  * `Array::compare_at` `src/enums/array.rs:2357`, `hash_element_at` :2419).
  * Expressed as declarative DataFrame plans so Catalyst supplies pushdown,
  * partial aggregation, join strategy selection and AQE at 100 TB scale.
  *
  * Scale notes (local[32] now, 1000-executor target):
  *   - every aggregation here is partial+final (Spark default hash agg);
  *   - dimension joins (part=20k rows/SF, nation=25, customer=1.5% of fact)
  *     are explicitly `broadcast()` so no fact-table shuffle happens;
  *   - only genuinely-large joins (lineitem⋈orders) shuffle, on their join
  *     key, which AQE can further coalesce/skew-split.
  */
object Relational {

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s + " 00:00:00"))

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape: full-scan grouped aggregation with derived measures.
    QueryDef.sql(
      "q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
        |  ROUND(AVG(l_discount), 4) AS avg_disc,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // TPC-H Q6 shape: selective scan + single scalar agg. Filters push to
    // the parquet scan (verified via explain: PushedFilters on l_shipdate,
    // l_discount, l_quantity).
    QueryDef.sql(
      "q02_forecast_revenue",
      """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.08
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount").between(0.02, 0.08) &&
          col("l_quantity") < 24)
        .agg(
          round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q3 shape: fact⋈fact shuffle join + broadcast dim filter + top-k.
    QueryDef.sql(
      "q03_shipping_priority",
      """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < ts("1998-03-15"))
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > ts("1995-03-15"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // Sort + limit (minarrow delegates ordering; comparator semantics from
    // Array::compare_at, src/enums/array.rs:2357).
    QueryDef.sql(
      "q04_top_orders",
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS total, o_orderstatus
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"), col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
        .drop("o_totalprice")
    },

    // Broadcast dim join: part is small per-SF → no shuffle of lineitem.
    QueryDef.sql(
      "q05_brand_volume",
      """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  ROUND(SUM(l_quantity), 2) AS total_qty,
        |  ROUND(AVG(l_extendedprice), 4) AS avg_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 2).as("total_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"))
        .orderBy(col("p_brand"))
    },

    // TPC-H Q5 shape: snowflake join chain, dims broadcast, facts shuffle once.
    QueryDef.sql(
      "q06_nation_revenue",
      """SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
      Tables.lineitem(s, d)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Anti join (NOT EXISTS): customers that never ordered, per segment.
    QueryDef.sql(
      "q07_silent_customers",
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },

    // Semi join (EXISTS) + set-op INTERSECT.
    QueryDef.sql(
      "q08_building_buyers",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val a = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val b = Tables.orders(s, d).filter(col("o_totalprice") > 100000).select(col("o_custkey").as("c_custkey"))
      a.intersect(b).orderBy(col("c_custkey"))
    },

    // Set-op EXCEPT.
    QueryDef.sql(
      "q09_no_big_orders",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val a = Tables.customer(s, d).filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey"))
      val b = Tables.orders(s, d).filter(col("o_totalprice") > 300000).select(col("o_custkey").as("c_custkey"))
      a.except(b).orderBy(col("c_custkey"))
    },

    // Window functions: per-partition ranking + running aggregate. Single
    // shuffle on the partition key; window itself is sort-based per partition.
    QueryDef.sql(
      "q10_supplier_running",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |  ROUND(SUM(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |FROM lineitem
        |WHERE l_orderkey < 1000
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 1000)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          row_number().over(w).cast("long").as("rn"),
          round(sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_qty"))
        .orderBy(col("l_suppkey"), col("rn"))
    },

    // cross_tabulate (the reference's one relational aggregation —
    // minarrow src/kernels/string.rs:2034): contingency counts of two
    // low-cardinality text columns == groupBy().pivot().count().
    QueryDef.sql(
      "q11_crosstab",
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot(col("l_linestatus"), Seq("F", "O"))
        .count()
        .na.fill(0L, Seq("F", "O"))
        .orderBy(col("l_returnflag"))
    },

    // Grouped distinct counting: exact (count_distinct_string analog,
    // minarrow src/kernels/string.rs:1068).
    QueryDef.sql(
      "q12_distinct_parts",
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag"))
    }
,

    // Correlated scalar subquery (TPC-H Q17 shape): lineitems below 20%%
    // of their part's average quantity.
    QueryDef.sql(
      "q64_below_avg_qty",
      """SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l1
        |WHERE l_quantity < (
        |  SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        |  WHERE l2.l_partkey = l1.l_partkey)""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val avgQty = li.groupBy(col("l_partkey").as("pk"))
        .agg((avg(col("l_quantity")) * 0.2).as("threshold"))
      li.join(avgQty, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("threshold"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    },

    // Grouped HAVING (post-aggregation filter).
    QueryDef.sql(
      "q65_big_suppliers",
      """SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(l_quantity), 2) AS total_qty
        |FROM lineitem GROUP BY l_suppkey
        |HAVING SUM(l_quantity) > 15000
        |ORDER BY l_suppkey""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("total_qty"),
          sum(col("l_quantity")).as("__raw"))
        .filter(col("__raw") > 15000)
        .drop("__raw")
        .orderBy(col("l_suppkey"))
    },

    // Full window-function battery: lead/lag/ntile/percent_rank/cume_dist/
    // first/last value over one partitioned-and-ordered frame (single
    // shuffle on the partition key).
    QueryDef.sql(
      "q77_window_battery",
      """SELECT o_custkey, o_orderkey,
        |  CAST(lead(o_orderkey, 1) OVER w AS BIGINT) AS next_ok,
        |  CAST(lag(o_orderkey, 1) OVER w AS BIGINT) AS prev_ok,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  ROUND(percent_rank() OVER w, 6) AS prank,
        |  ROUND(cume_dist() OVER w, 6) AS cdist,
        |  ROUND(first_value(o_totalprice) OVER w, 2) AS first_price,
        |  ROUND(last_value(o_totalprice) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_price
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"),
          lead(col("o_orderkey"), 1).over(w).cast("long").as("next_ok"),
          lag(col("o_orderkey"), 1).over(w).cast("long").as("prev_ok"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("prank"),
          round(cume_dist().over(w), 6).as("cdist"),
          round(first(col("o_totalprice")).over(w), 2).as("first_price"),
          round(last(col("o_totalprice")).over(wAll), 2).as("last_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL keep multiplicity
    // (the DISTINCT variants are q08/q09).
    QueryDef.sql(
      "q78_setops_all",
      """WITH a AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000),
        |b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT 'intersect' AS op, o_custkey, CAST(COUNT(*) AS BIGINT) AS n FROM
        |  (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b) GROUP BY o_custkey
        |UNION ALL
        |SELECT 'except' AS op, o_custkey, CAST(COUNT(*) AS BIGINT) AS n FROM
        |  (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b) GROUP BY o_custkey
        |ORDER BY op, o_custkey""".stripMargin) { (s, d) =>
      val a = Tables.orders(s, d).filter(col("o_totalprice") > 100000).select(col("o_custkey"))
      val b = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      val ia = a.intersectAll(b).groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("intersect"))
      val ea = a.exceptAll(b).groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("except"))
      ia.unionByName(ea).select(col("op"), col("o_custkey"), col("n"))
        .orderBy(col("op"), col("o_custkey"))
    },

    // Outer joins with NULL sides (left + full), broadcast-eligible right.
    QueryDef.sql(
      "q79_outer_joins",
      """SELECT c.c_custkey, CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
        |  COALESCE(ROUND(o.o_totalprice, 2), -1.0) AS price_or_sentinel
        |FROM customer c LEFT JOIN orders o
        |  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
        |WHERE c.c_custkey < 300
        |ORDER BY c.c_custkey, o_orderkey NULLS FIRST""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_custkey") < 300).select(col("c_custkey"))
      val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      c.join(o, col("c_custkey") === col("o_custkey") && col("o_totalprice") > 400000, "left")
        .select(col("c_custkey"), col("o_orderkey").cast("long").as("o_orderkey"),
          coalesce(round(col("o_totalprice"), 2), lit(-1.0)).as("price_or_sentinel"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    // Unpivot/melt (wide -> long) — the inverse of crosstab/pivot (§2.3).
    QueryDef.sql(
      "q80_unpivot",
      """SELECT c_custkey, metric, ROUND(val, 2) AS val FROM (
        |  UNPIVOT (SELECT c_custkey, c_acctbal, CAST(c_nationkey AS DOUBLE) AS c_nationkey
        |           FROM customer WHERE c_custkey < 200)
        |  ON c_acctbal, c_nationkey INTO NAME metric VALUE val)
        |ORDER BY c_custkey, metric""".stripMargin) { (s, d) =>
      Tables.customer(s, d).filter(col("c_custkey") < 200)
        .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey").cast("double").as("c_nationkey"))
        .unpivot(Array(col("c_custkey")), Array(col("c_acctbal"), col("c_nationkey")), "metric", "val")
        .select(col("c_custkey"), col("metric"), round(col("val"), 2).as("val"))
        .orderBy(col("c_custkey"), col("metric"))
    }
  )
}