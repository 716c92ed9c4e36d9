package graft

import graft.ops.{Introspect, RangeJoin}
import org.apache.spark.sql.functions._

/** Range join, SQL-registered kernels, introspection. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join matches the naive range predicate join") {
    val points = Seq((1L, "2024-01-01 00:30:00"), (1L, "2024-01-01 03:30:00"),
      (2L, "2024-01-01 00:30:00")).map { case (k, t) => (k, java.sql.Timestamp.valueOf(t)) }
      .toDF("user_id", "ts")
    val intervals = Seq((10L, 1L, "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
      (11L, 2L, "2024-01-01 01:00:00", "2024-01-01 02:00:00")).map {
        case (id, k, s, e) => (id, k, java.sql.Timestamp.valueOf(s), java.sql.Timestamp.valueOf(e))
      }.toDF("iid", "user_id", "w_start", "w_end")
    val got = RangeJoin.pointInInterval(points, intervals, "ts", "w_start", "w_end",
        Seq("user_id"), binWidthUs = 3600L * 1000000)
      .select(col("iid"), col("ts")).collect().map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    // naive reference
    val naive = points.as("p").join(intervals.as("i"),
        col("p.user_id") === col("i.user_id") &&
        col("p.ts") >= col("i.w_start") && col("p.ts") < col("i.w_end"))
      .select(col("iid"), col("p.ts")).collect().map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    assert(got === naive)
    assert(got === Set((10L, "2024-01-01 00:30:00.0")))  // point 2 outside, user-2 point before window
  }

  test("broadcast point-in-interval equals the binned form and never shuffles points") {
    // realistic shape: events (points) against per-user click windows
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    val intervals = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("iid"), col("user_id"),
        col("ts").as("w_start"), (col("ts") + expr("INTERVAL 2 HOUR")).as("w_end"))
    val points = ev.select(col("event_id").as("pid"), col("user_id"), col("ts"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val binned = RangeJoin.pointInInterval(points, intervals, "ts", "w_start", "w_end",
      Seq("user_id"), binWidthUs = 2L * 3600 * 1000000)
    val bcast = RangeJoin.pointInIntervalBroadcast(points, intervals,
      "ts", "w_start", "w_end", Seq("user_id"))
    assert(rows(bcast) === rows(binned))
    assert(rows(bcast).nonEmpty)
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"points were shuffled:\n$plan")
  }

  test("interval-overlap join equals the naive overlap predicate, emitted once per pair") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // windows spanning multiple bins (1h bin width) to exercise the
    // first-shared-bin dedupe: pair (20,30) overlaps across 3 bins
    val a = Seq((20L, 1L, "2024-01-01 00:00:00", "2024-01-01 05:00:00"),
      (21L, 1L, "2024-01-01 08:00:00", "2024-01-01 09:00:00"),
      (22L, 2L, "2024-01-01 00:00:00", "2024-01-01 01:00:00"))
      .map { case (id, k, s, e) => (id, k, ts(s), ts(e)) }.toDF("aid", "k", "lo1", "hi1")
    val b = Seq((30L, 1L, "2024-01-01 01:30:00", "2024-01-01 04:30:00"),
      (31L, 1L, "2024-01-01 04:59:00", "2024-01-01 06:00:00"),
      (32L, 2L, "2024-01-01 01:00:00", "2024-01-01 02:00:00"))
      .map { case (id, k, s, e) => (id, k, ts(s), ts(e)) }.toDF("bid", "k", "lo2", "hi2")
    val got = RangeJoin.intervalOverlap(a, b, "lo1", "hi1", "lo2", "hi2",
        Seq("k"), binWidthUs = 3600L * 1000000)
      .select(col("aid"), col("bid")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.distinct.length, "pairs must be emitted exactly once")
    val expect = a.as("x").join(b.as("y"),
        col("x.k") === col("y.k") && col("x.lo1") < col("y.hi2") && col("y.lo2") < col("x.hi1"))
      .select(col("aid"), col("bid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet === expect)
    assert(got.toSet === Set((20L, 30L), (20L, 31L))) // half-open: 22/32 touch, don't overlap
  }

  test("registered SQL kernels evaluate") {
    GraftFunctions.registerAll(spark)
    // integer literals on purpose: constant folding runs interpreted eval,
    // which exercises the SQL-boundary type coercion
    val r = spark.sql(
      "SELECT fma(2, 3, 1), int_floor_div(-7, 2), find_str0('hello', 'll'), " +
      "count_match('ololol', 'ol'), wrap_int8(200), rolling_hash('abc') = rolling_hash('abc')").head()
    assert(r.getDouble(0) === 7.0)
    assert(r.getLong(1) === -4L)
    assert(r.getLong(2) === 2L)
    assert(r.getLong(3) === 3L)
    assert(r.getLong(4) === -56L)
    assert(r.getBoolean(5))
    // struct-returning kernels on the SQL surface (constant-folded too)
    val st = spark.sql(
      "SELECT repetition_stats('x y x y x').top_word_cnt, " +
      "repetition_stats('x y x y x').top_bigram_cnt, " +
      "text_stats('the small cat').n_tok_ws").head()
    assert(st.getLong(0) === 3L)
    assert(st.getLong(1) === 2L)
    assert(st.getLong(2) === 3L)
  }

  test("Observe: metrics ride the pipeline action and match direct aggregation") {
    import graft.ops.Observe
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, Double.NaN), (4L, 40.0))
      .toDF("id", "v").filter(col("id") =!= 3L)
    val stats = Observe.observedStats(spark, df, Seq(
      "n" -> count(lit(1)),
      "sum_v" -> sum(col("v")),
      "max_id" -> max(col("id")))).head()
    assert(stats.getLong(0) === 3L)
    assert(stats.getDouble(1) === 70.0)
    assert(stats.getLong(2) === 4L)
    // the write-variant lands the data AND returns the same stats, one scan
    val out = java.nio.file.Files.createTempDirectory("graft_obs").toString + "/p"
    val stats2 = Observe.writeWithStats(spark, df, out, Seq("n" -> count(lit(1)))).head()
    assert(stats2.getLong(0) === 3L)
    assert(spark.read.parquet(out).count() === 3L)
  }

  test("introspection: shape, size estimate, schema, render") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    assert(Introspect.shape(df) === (2L, 2))
    assert(Introspect.estimatedBytes(df) > 0)
    assert(Introspect.schemaTree(df).contains("id"))
    val rendered = Introspect.render(df, 5)
    assert(rendered.contains("id:Int64") && rendered.contains("s:String"))
    assert(rendered.contains(" a ") && rendered.contains("[2 rows × 2 cols]"))
  }

  test("asOf plans agree on NULL keys (broadcast joins null-safe)") {
    import graft.ops.AsOfJoin
    val left = Seq((Some(1L), 100L, "l1"), (None, 100L, "l2"), (Some(2L), 50L, "l3"))
      .toDF("k", "ts", "tag")
    val right = Seq((Some(1L), 90L, 1.0), (None, 80L, 2.0), (Some(2L), 60L, 3.0))
      .toDF("k", "rts", "price")
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(2), if (r.isNullAt(3)) None else Some(r.getDouble(r.fieldIndex("price"))))
    val win = AsOfJoin.asOf(left, right, "ts", "rts", Seq("k"))
      .select(col("tag"), col("price")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    val bc = AsOfJoin.asOfBroadcast(left, right, "ts", "rts", Seq("k"))
      .select(col("tag"), col("price")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(bc === win)
    // the null-key left row matches the null-key series row
    assert(bc.contains(("l2", Some(2.0))))
  }

  test("TableDiff.diff duplicate-key guard trips only when asked") {
    import graft.ops.TableDiff
    val a = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("id", "v")
    val b = Seq((1L, "x"), (2L, "z")).toDF("id", "v")
    // default: documented precondition, no scan spent on checking
    TableDiff.diff(a, b, Seq("id")).collect()
    val e = intercept[IllegalArgumentException] {
      TableDiff.diff(a, b, Seq("id"), checkUniqueKeys = true).collect()
    }
    assert(e.getMessage.contains("not unique"))
    // unique keys pass the guard
    assert(TableDiff.diff(b, b, Seq("id"), checkUniqueKeys = true).count() === 0L)
  }

  test("TableDiff.diff matches NULL keys null-safely (no phantom added+removed churn)") {
    import graft.ops.TableDiff
    // an equi-join would report the unchanged NULL-key row as added AND
    // removed — phantom churn in a change ledger (same asOf convention:
    // NULL keys identify the same row across snapshots)
    val before = Seq((Some(1L), "x"), (None, "n"), (Some(2L), "gone"))
      .toDF("id", "v")
    val after = Seq((Some(1L), "x"), (None, "n2"), (Some(3L), "new"))
      .toDF("id", "v")
    val got = TableDiff.diff(before, after, Seq("id")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1)).toMap
    assert(got === Map(None -> "changed", Some(2L) -> "removed", Some(3L) -> "added"),
      s"diff misreported NULL keys: $got")
    // an unchanged NULL-key row produces NO row at all
    val same = Seq((None: Option[Long], "n")).toDF("id", "v")
    assert(TableDiff.diff(same, same, Seq("id")).count() === 0L)
  }
}
