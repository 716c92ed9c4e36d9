package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

/** As-of join + SQL-entry queries. The SQL-entry pair run the SAME ANSI
  * text through `spark.sql` and the DuckDB oracle — demonstrating the
  * engine's SQL surface with dialect-portable queries.
  */
object AdvancedQueries {

  /** Same SQL text runs on Spark (via temp views) and DuckDB. */
  private def sqlBoth(name: String, sql: String): QueryDef =
    QueryDef(name, (s, d) => { Tables.registerAll(s, d); s.sql(sql) }, Some(sql))

  val defs: Seq[QueryDef] = Seq(

    // As-of join: each event enriched with the most recent order of the
    // same user (inclusive on equal timestamps). Right side deduped to
    // one row per (key, time) so the match is deterministic.
    QueryDef.sql(
      "q54_asof_join",
      """WITH o1 AS (
        |  SELECT o_custkey AS user_id, o_orderdate,
        |    MAX(o_orderkey) AS o_orderkey,
        |    MAX_BY(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o1.o_orderkey, o1.o_totalprice
        |FROM events e ASOF LEFT JOIN o1
        |  ON e.user_id = o1.user_id AND e.ts >= o1.o_orderdate
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val right = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
      val left = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      AsOfJoin.asOf(left, right, leftTime = "ts", rightTime = "o_orderdate",
          keys = Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("event_id"))
    },

    // Forward as-of: the EARLIEST order at-or-after each event (pandas
    // merge_asof direction='forward'); same one-shuffle merge plan with the
    // traversal reversed. Oracle: DuckDB ASOF with the <= inequality.
    QueryDef.sql(
      "q81_asof_forward",
      """WITH o1 AS (
        |  SELECT o_custkey AS user_id, o_orderdate,
        |    MAX(o_orderkey) AS o_orderkey,
        |    MAX_BY(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o1.o_orderkey, o1.o_totalprice
        |FROM events e ASOF LEFT JOIN o1
        |  ON e.user_id = o1.user_id AND e.ts <= o1.o_orderdate
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val right = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
      val left = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      AsOfJoin.asOf(left, right, leftTime = "ts", rightTime = "o_orderdate",
          keys = Seq("user_id"), direction = "forward")
        .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("event_id"))
    },

    // The SAME as-of semantics through the PHYSICAL operator
    // (plans.AsOfJoinExec — custom SparkPlan with distribution/ordering
    // requirements and a single-pass per-partition merge) instead of the
    // window composition. Oracle identical to q54's DuckDB ASOF; a
    // tolerance band (<= 30 days) exercises the merge_asof tolerance path,
    // expressed in SQL as a post-hoc NULL-out of too-old matches.
    QueryDef.sql(
      "q86_asof_physical",
      """WITH o1 AS (
        |  SELECT o_custkey AS user_id, o_orderdate,
        |    MAX(o_orderkey) AS o_orderkey,
        |    MAX_BY(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2),
        |a AS (
        |  SELECT e.event_id, e.user_id, e.ts, o1.o_orderdate,
        |    o1.o_orderkey, o1.o_totalprice
        |  FROM events e ASOF LEFT JOIN o1
        |    ON e.user_id = o1.user_id AND e.ts >= o1.o_orderdate)
        |SELECT event_id, user_id,
        |  CASE WHEN ts - o_orderdate <= INTERVAL 30 DAY THEN o_orderkey END AS o_orderkey,
        |  CASE WHEN ts - o_orderdate <= INTERVAL 30 DAY THEN o_totalprice END AS o_totalprice
        |FROM a ORDER BY event_id""".stripMargin) { (s, d) =>
      val right = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
      // the physical operator is strict about time types; events.ts is
      // session-TZ TIMESTAMP while o_orderdate is NTZ — identical wall
      // clock under the UTC session, so align at the query site
      val left = Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"))
      AsOfJoin.asOfPhysical(left, right, leftTime = "ts", rightTime = "o_orderdate",
          keys = Seq("user_id"), tolerance = Some(30L * 86400L * 1000000L))
        .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("event_id"))
    },

    // TPC-H Q10 shape through the SQL surface — identical text both engines.
    sqlBoth(
      "q55_sql_returned_revenue",
      """SELECT c_custkey, c_name, n_name,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin),

    // TPC-H Q4 shape: correlated EXISTS through the SQL surface.
    sqlBoth(
      "q56_sql_order_priority",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
,

    // Point-in-interval range join via binning: each signup opens a 2h
    // window; count same-user events inside it. Spark would nested-loop
    // the raw range predicate — the binned form is one equi-join shuffle.
    QueryDef.sql(
      "q62_range_join",
      """SELECT s.event_id, CAST(COUNT(*) AS BIGINT) AS n_in_window
        |FROM events s JOIN events e
        |  ON e.user_id = s.user_id
        |  AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 2 HOUR
        |WHERE s.event_type = 'signup'
        |GROUP BY s.event_id ORDER BY s.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val intervals = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 2 HOUR")).as("w_end"))
      val points = ev.select(col("user_id"), col("ts"))
      graft.ops.RangeJoin.pointInInterval(
          points, intervals, "ts", "w_start", "w_end",
          keys = Seq("user_id"), binWidthUs = 2L * 3600 * 1000000)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_in_window"))
        .orderBy(col("event_id"))
    },

    // q62's point-in-interval semantics through the BROADCAST variant:
    // the signup windows are dimension-sized, so they pack to one array
    // per user and broadcast — the event stream is never shuffled and
    // never explodes to bins. Oracle identical to q62's naive range SQL.
    QueryDef.sql(
      "q126_range_broadcast",
      """SELECT s.event_id, CAST(COUNT(*) AS BIGINT) AS n_in_window
        |FROM events s JOIN events e
        |  ON e.user_id = s.user_id
        |  AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 2 HOUR
        |WHERE s.event_type = 'signup'
        |GROUP BY s.event_id ORDER BY s.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val intervals = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 2 HOUR")).as("w_end"))
      val points = ev.select(col("user_id"), col("ts"))
      graft.ops.RangeJoin.pointInIntervalBroadcast(
          points, intervals, "ts", "w_start", "w_end", keys = Seq("user_id"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_in_window"))
        .orderBy(col("event_id"))
    },

    // Custom kernels through the SQL surface: registered functions callable
    // from spark.sql; oracle replays the semantics in portable SQL.
    QueryDef.sql(
      "q63_sql_kernels",
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(l_quantity * l_discount + l_tax, 6) AS fma_v,
        |  CAST(floor((l_orderkey - 2 * l_partkey) / CAST(l_linenumber AS DOUBLE)) AS BIGINT) AS fdiv_v,
        |  (NULLIF(instr(l_returnflag, 'R'), 0) - 1) AS find_v,
        |  CAST((length(l_linestatus) - length(replace(l_linestatus, 'O', ''))) AS BIGINT) AS cnt_v,
        |  CAST(power(l_linenumber, 2) AS BIGINT) AS ipow_v,
        |  CAST(CAST(CAST(l_quantity AS REAL) AS DOUBLE) * CAST(CAST(l_discount AS REAL) AS DOUBLE)
        |       + CAST(CAST(l_tax AS REAL) AS DOUBLE) AS REAL) AS fma32_v
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      graft.GraftFunctions.registerAll(s)
      Tables.registerAll(s, d)
      s.sql("""SELECT l_orderkey, l_linenumber,
        ROUND(fma(l_quantity, l_discount, l_tax), 6) AS fma_v,
        int_floor_div(l_orderkey - 2 * l_partkey, l_linenumber) AS fdiv_v,
        find_str0(l_returnflag, 'R') AS find_v,
        count_match(l_linestatus, 'O') AS cnt_v,
        int_pow(l_linenumber, 2) AS ipow_v,
        CAST(CAST(CAST(l_quantity AS FLOAT) AS DOUBLE) * CAST(CAST(l_discount AS FLOAT) AS DOUBLE)
             + CAST(CAST(l_tax AS FLOAT) AS DOUBLE) AS FLOAT) AS fma32_v
        FROM lineitem WHERE l_orderkey < 500
        ORDER BY l_orderkey, l_linenumber""")
    },

    // SCD2 / temporal-table point-in-time lookup: a change log (clicks)
    // becomes validity intervals via lead() — valid_to = next change,
    // capped at the key's last activity +1s so open intervals stay
    // bounded — and points (purchases) join the interval active at their
    // timestamp through the binned range join (no nested loop). The
    // interval CONSTRUCTION is the new surface; q62/q84 pin the join.
    QueryDef.sql(
      "q123_scd2_pit",
      """WITH c AS (
        |  SELECT user_id, event_id, value, ts,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
        |    MAX(ts) OVER (PARTITION BY user_id) AS last_ts
        |  FROM events WHERE event_type = 'click'),
        |h AS (
        |  SELECT user_id, event_id AS click_id, value, ts AS valid_from,
        |    COALESCE(nxt, last_ts + INTERVAL 1 SECOND) AS valid_to
        |  FROM c),
        |p AS (SELECT event_id AS purchase_id, user_id, ts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, h.click_id, ROUND(h.value, 2) AS active_value
        |FROM p JOIN h ON p.user_id = h.user_id
        |  AND p.ts >= h.valid_from AND p.ts < h.valid_to
        |ORDER BY purchase_id, click_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("click_id"))
      val wAll = Window.partitionBy(col("user_id"))
      val h = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("value"), col("ts"))
        .withColumn("valid_from", col("ts"))
        .withColumn("valid_to", coalesce(lead(col("ts"), 1).over(wSeq),
          max(col("ts")).over(wAll) + expr("INTERVAL 1 SECOND")))
        .select(col("user_id"), col("click_id"), col("value"),
          col("valid_from"), col("valid_to"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      graft.ops.RangeJoin.pointInInterval(
          p, h, "ts", "valid_from", "valid_to",
          keys = Seq("user_id"), binWidthUs = 86400L * 1000000L)
        .select(col("purchase_id"), col("click_id"), round(col("value"), 2).as("active_value"))
        .orderBy(col("purchase_id"), col("click_id"))
    },

    // The THIRD as-of plan: broadcast as-of (q54 = window composition,
    // q86 = custom physical operator). The dimension-sized right series
    // collapses to one sorted array per key and broadcasts; the fact
    // side never shuffles or sorts — the plan for enriching a 100 TB
    // event stream against a reference table. Oracle identical to q54.
    QueryDef.sql(
      "q121_asof_broadcast",
      """WITH o1 AS (
        |  SELECT o_custkey AS user_id, o_orderdate,
        |    MAX(o_orderkey) AS o_orderkey,
        |    MAX_BY(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o1.o_orderkey, o1.o_totalprice
        |FROM events e ASOF LEFT JOIN o1
        |  ON e.user_id = o1.user_id AND e.ts >= o1.o_orderdate
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val right = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
      val left = Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"))
      AsOfJoin.asOfBroadcast(left, right, leftTime = "ts", rightTime = "o_orderdate",
          keys = Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("event_id"))
    },

    // Bloom-filter semi-join reduction: the fact scan is prefiltered by a
    // compact bit-set membership test on the dimension's key set BEFORE
    // the join shuffle (the runtime-filter pattern at 100 TB). No false
    // negatives + exact join ⇒ result identical to the plain join, which
    // is exactly what the oracle runs.
    QueryDef.sql(
      "q108_bloom_join",
      """SELECT s_suppkey, s_name,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7'
        |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val dim = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("l_suppkey"), col("s_suppkey"), col("s_name"))
      val fact = Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      graft.ops.BloomJoin.bloomFilteredJoin(fact, dim, Seq("l_suppkey"),
          expectedItems = 64)
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("s_suppkey"))
    }
  )
}