package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

/** Physical as-of join (plans.AsOfJoinPlan/AsOfJoinExec): semantics vs the
  * window-composed form, NULL behavior, and plan shape.
  */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  private def normalize(df: org.apache.spark.sql.DataFrame): Seq[Seq[Option[Any]]] =
    df.collect().toSeq
      .map(r => (0 until r.length).map(i => Option(r.get(i))))
      .sortBy(_.toString)

  test("physical asOf matches the hand-computed model (backward, inclusive)") {
    val quotes = Seq(
      ("a", 1L, 10.0), ("a", 5L, 11.0), ("a", 9L, 12.0),
      ("b", 2L, 20.0)).toDF("k", "qt", "price")
    val trades = Seq(
      ("a", 0L), ("a", 1L), ("a", 6L), ("a", 100L),
      ("b", 1L), ("b", 3L)).toDF("k", "tt")
    val out = AsOfJoin.asOfPhysical(trades, quotes, "tt", "qt", Seq("k"))
      .orderBy(col("k"), col("tt"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq === Seq(
      ("a", 0L, None),
      ("a", 1L, Some(10.0)),  // inclusive at equal time
      ("a", 6L, Some(11.0)),
      ("a", 100L, Some(12.0)),
      ("b", 1L, None),
      ("b", 3L, Some(20.0))))
  }

  test("physical asOf forward + tolerance (merge_asof parity)") {
    val quotes = Seq(("a", 1L, 10.0), ("a", 5L, 11.0), ("a", 9L, 12.0)).toDF("k", "qt", "price")
    val trades = Seq(("a", 0L), ("a", 1L), ("a", 6L), ("a", 100L)).toDF("k", "tt")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("tt")).collect().map(r =>
        (r.getLong(1), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    val fwd = AsOfJoin.asOfPhysical(trades, quotes, "tt", "qt", Seq("k"), direction = "forward")
    assert(collect(fwd) === Seq(
      (0L, Some(10.0)), (1L, Some(10.0)), (6L, Some(12.0)), (100L, None)))
    val tol = AsOfJoin.asOfPhysical(trades, quotes, "tt", "qt", Seq("k"),
      tolerance = Some(2L))
    assert(collect(tol) === Seq(
      (0L, None), (1L, Some(10.0)), (6L, Some(11.0)), (100L, None)))
  }

  test("physical asOf NULL semantics: null keys/times never match, left rows kept") {
    val quotes = Seq(
      (Option("a"), Option(1L), 10.0),
      (Option("a"), Option.empty[Long], 66.0),  // null right time: skipped
      (Option.empty[String], Option(1L), 67.0)) // null right key: skipped
      .toDF("k", "qt", "price")
    val trades = Seq(
      (Option("a"), Option(2L)),
      (Option("a"), Option.empty[Long]),  // null left time: kept, no match
      (Option.empty[String], Option(2L))) // null left key: kept, no match
      .toDF("k", "tt")
    val out = AsOfJoin.asOfPhysical(trades, quotes, "tt", "qt", Seq("k"))
    assert(out.count() === 3)
    val matched = out.filter(col("price").isNotNull).collect()
    assert(matched.map(_.getDouble(3)).toSeq === Seq(10.0))
    assert(matched.head.getString(0) === "a" && matched.head.getLong(1) === 2L)
  }

  test("physical asOf is row-for-row equivalent to the window-composed asOf") {
    val rnd = new scala.util.Random(7)
    val keys = Vector("a", "b", "c", "d")
    val quotes = Seq.fill(300)((keys(rnd.nextInt(4)), rnd.nextInt(50).toLong,
      rnd.nextInt(1000).toDouble)).distinct.toDF("k", "qt", "price")
    val trades = Seq.fill(400)((keys(rnd.nextInt(4)), rnd.nextInt(60).toLong))
      .toDF("k", "tt")
    // right side deduped per (key,time) so both implementations are
    // deterministic about WHICH row matches
    val q1 = quotes.groupBy("k", "qt").agg(max("price").as("price"))
    for (dir <- Seq("backward", "forward")) {
      val a = AsOfJoin.asOf(trades, q1, "tt", "qt", Seq("k"), direction = dir)
      val b = AsOfJoin.asOfPhysical(trades, q1, "tt", "qt", Seq("k"), direction = dir)
      assert(a.columns.sorted.toSeq === b.columns.sorted.toSeq)
      assert(normalize(a.select(b.columns.map(col).toIndexedSeq: _*)) === normalize(b), dir)
    }
  }

  test("physical asOf plan: AsOfJoinExec present, no Window, keys-only exchanges") {
    val quotes = Seq(("a", 1L, 10.0)).toDF("k", "qt", "price")
    val trades = Seq(("a", 2L)).toDF("k", "tt")
    val df = AsOfJoin.asOfPhysical(trades, quotes, "tt", "qt", Seq("k"))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"))
    assert(!physical.contains("Window"))
    // the shuffle is on the key alone — time never appears in a partitioning
    val exchanges = physical.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(l => l.contains("hashpartitioning(k")))
    assert(!exchanges.exists(l => l.contains("qt") || l.contains("tt")))
  }

  test("RangeJoinRule rewrites LONG-axis point-in-interval joins (binSizeUnits key)") {
    val s2 = org.apache.spark.sql.graft.SessionBridge.newSessionWithExtensions(
      spark, new GraftExtensions()(_))
    import s2.implicits._
    val points = Seq((1L, 105L), (2L, 230L), (3L, 999L)).toDF("pid", "pt")
    val ivs = Seq((10L, 100L, 150L), (11L, 140L, 260L), (12L, 990L, 991L)).toDF("iid", "lo", "hi")
    val cond = col("pt") >= col("lo") && col("pt") < col("hi")
    val naive = points.join(ivs, cond)
    assert(naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val expect = naive.collect().map(_.toSeq).toSet
    s2.conf.set("spark.graft.rangeJoin.binSizeUnits", "50")
    try {
      val rewritten = points.join(ivs, cond)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"not rewritten:\n$plan")
      assert(rewritten.collect().map(_.toSeq).toSet === expect)
    } finally s2.conf.unset("spark.graft.rangeJoin.binSizeUnits")
  }

  test("RangeJoinRule rewrites DATE-axis joins (bin width in days)") {
    val s2 = org.apache.spark.sql.graft.SessionBridge.newSessionWithExtensions(
      spark, new GraftExtensions()(_))
    import s2.implicits._
    val points = Seq((1L, "2024-01-05"), (2L, "2024-02-10"), (3L, "2024-03-01"))
      .toDF("pid", "d_s").select(col("pid"), col("d_s").cast("date").as("d"))
    val ivs = Seq((10L, "2024-01-01", "2024-01-31"), (11L, "2024-02-01", "2024-02-10"))
      .toDF("iid", "lo_s", "hi_s")
      .select(col("iid"), col("lo_s").cast("date").as("lo"), col("hi_s").cast("date").as("hi"))
    // inclusive upper this time: d >= lo AND d <= hi
    val cond = col("d") >= col("lo") && col("d") <= col("hi")
    val naive = points.join(ivs, cond)
    val expect = naive.collect().map(_.toSeq).toSet
    s2.conf.set("spark.graft.rangeJoin.binSizeDays", "7")
    try {
      val rewritten = points.join(ivs, cond)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"not rewritten:\n$plan")
      assert(rewritten.collect().map(_.toSeq).toSet === expect)
      assert(expect.map(_(0)) === Set(1L, 2L))
    } finally s2.conf.unset("spark.graft.rangeJoin.binSizeDays")
  }

  test("RangeJoinRule rewrites interval-overlap joins, one row per pair") {
    val s2 = org.apache.spark.sql.graft.SessionBridge.newSessionWithExtensions(
      spark, new GraftExtensions()(_))
    import s2.implicits._
    val rnd = new scala.util.Random(11)
    // long-axis windows spanning MANY bins so the dedupe filter is load-bearing
    val a = Seq.tabulate(60) { i =>
      val lo = rnd.nextInt(500).toLong; (i.toLong, lo, lo + 1 + rnd.nextInt(200))
    }.toDF("aid", "alo", "ahi")
    val b = Seq.tabulate(60) { i =>
      val lo = rnd.nextInt(500).toLong; (i.toLong, lo, lo + 1 + rnd.nextInt(200))
    }.toDF("bid", "blo", "bhi")
    val cond = col("alo") < col("bhi") && col("blo") < col("ahi")
    val naive = a.join(b, cond)
    assert(naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val expect = naive.collect().map(_.toSeq)
    s2.conf.set("spark.graft.rangeJoin.binSizeUnits", "40")
    try {
      val rewritten = a.join(b, cond)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"not rewritten:\n$plan")
      val got = rewritten.collect().map(_.toSeq)
      // exact multiset equality: pairs sharing many bins must appear ONCE
      assert(got.sortBy(_.toString).toSeq === expect.sortBy(_.toString).toSeq)
    } finally s2.conf.unset("spark.graft.rangeJoin.binSizeUnits")
  }

  test("ops.intervalOverlap handles empty/inverted intervals without bin explosion") {
    import spark.implicits._
    val a = Seq((1L, 10L, 10L), (2L, 20L, 5L), (3L, 0L, 30L)).toDF("aid", "alo", "ahi")
    val b = Seq((7L, 5L, 25L)).toDF("bid", "blo", "bhi")
    val out = graft.ops.RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", Nil, 4L)
    // predicate semantics (loL < hiR AND loR < hiL), exactly once per pair
    val naive = a.join(b, col("alo") < col("bhi") && col("blo") < col("ahi"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(out.collect().map(_.toSeq).sortBy(_.toString).toSeq === naive.toSeq)
  }

  test("GraftExtensions session plans AsOfJoinPlan without imperative registration") {
    val s2 = org.apache.spark.sql.graft.SessionBridge.newSessionWithExtensions(
      spark, new GraftExtensions()(_))
    import s2.implicits._
    val quotes = Seq(("a", 1L, 10.0)).toDF("k", "qt", "price")
    val trades = Seq(("a", 2L), ("a", 0L)).toDF("k", "tt")
    // build the logical node directly on the extension session — the
    // injected strategy (not ensureStrategy) must plan it
    import org.apache.spark.sql.graft.{ColumnBridge, PlanBridge}
    val lp = PlanBridge.analyzed(trades)
    val rp = PlanBridge.analyzed(quotes)
    val node = graft.plans.AsOfJoinPlan(
      lp, rp,
      Seq(lp.output.find(_.name == "k").get), Seq(rp.output.find(_.name == "k").get),
      lp.output.find(_.name == "tt").get, rp.output.find(_.name == "qt").get,
      forward = false, tolerance = None)
    val out = PlanBridge.ofRows(s2, node)
    assert(out.count() === 2)
    assert(out.filter(ColumnBridge.column(rp.output.find(_.name == "price").get).isNotNull)
      .count() === 1)
  }

  test("rechunkByKey partitioning is reused by the following groupBy (one exchange)") {
    val df = (1 to 400).map(i => (s"k${i % 7}", i.toDouble)).toDF("k", "v")
    val agg = graft.ops.Restructure.rechunkByKey(df, 8, col("k"))
      .groupBy(col("k")).agg(sum(col("v")).as("s"))
    val physical = agg.queryExecution.executedPlan.toString
    val exchanges = physical.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size === 1, s"expected the repartition to be the ONLY shuffle:\n$physical")
    assert(exchanges.head.contains("hashpartitioning(k"))
  }
}
