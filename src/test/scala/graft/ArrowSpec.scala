package graft

import graft.sources.ArrowInterop
import org.apache.spark.sql.functions._

/** Arrow interchange round-trip (§2.10 FFI-boundary analog). */
class ArrowSpec extends SparkSpec {
  import spark.implicits._

  test("DataFrame -> Arrow batches -> DataFrame round-trips values and schema") {
    val df = Seq(
      (1L, "alpha", 1.5, true),
      (2L, "beta", -0.25, false),
      (3L, null.asInstanceOf[String], Double.NaN, true)
    ).toDF("id", "s", "d", "b")
    val back = ArrowInterop.roundTrip(spark, df)
    assert(back.schema === df.schema)
    val a = df.orderBy(col("id")).collect().map(_.toSeq.map(v => if (v != null && v.equals(Double.NaN)) "NaN" else v))
    val b = back.orderBy(col("id")).collect().map(_.toSeq.map(v => if (v != null && v.equals(Double.NaN)) "NaN" else v))
    assert(a.toSeq === b.toSeq)
  }

  test("distributed round-trip keeps batches on executors across many partitions") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001").repartition(16)
    val back = ArrowInterop.roundTrip(spark, li)
    assert(back.rdd.getNumPartitions === 16, "import must preserve the export partitioning")
    assert(back.count() === li.count())
    val a = li.agg(sum(col("l_quantity")).cast("decimal(30,2)")).collect().head.get(0)
    val b = back.agg(sum(col("l_quantity")).cast("decimal(30,2)")).collect().head.get(0)
    assert(a === b)
  }

  test("driver-side round-trip (bounded handoff variant) still works") {
    val nation = Tables.nation(spark, "/root/testdata/sf0.001")
    val back = ArrowInterop.roundTripLocal(spark, nation)
    assert(back.orderBy(col("n_nationkey")).collect().map(_.toSeq).toSeq ===
      nation.orderBy(col("n_nationkey")).collect().map(_.toSeq).toSeq)
  }

  test("arrow batch directory sink/source round-trips a multi-partition table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_arrowdir").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_returnflag"))
      .repartition(4)
    ArrowInterop.writeBatchDir(li, dir)
    assert(new java.io.File(dir, "schema.json").exists())
    assert(new java.io.File(dir).list().count(_.endsWith(".arrowbatch")) >= 4)
    val back = ArrowInterop.readBatchDir(spark, dir)
    assert(back.schema === li.schema)
    val a = li.orderBy(col("l_orderkey"), col("l_linenumber")).collect().map(_.toSeq)
    val b = back.orderBy(col("l_orderkey"), col("l_linenumber")).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("DataSource V2 reader loads a batch dir with pruned columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.001").repartition(3)
    ArrowInterop.writeBatchDir(orders, dir)
    val back = spark.read.format("graft.sources.arrowdir").load(dir)
    assert(back.schema === orders.schema)
    // full-row equality through the v2 scan
    val a = orders.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    val b = back.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    // column pruning reaches the scan: the projected read reports only the
    // referenced columns in its ReadSchema (SupportsPushDownRequiredColumns)
    val slim = back.select(col("o_orderkey"), col("o_totalprice"))
    val plan = slim.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"pruning did not reach the v2 scan:\n$plan")
    // (no float-sum compare here — summation order differs across the new
    // partitioning; row equality above already pins content)
    assert(slim.count() === orders.count())
    // one input partition per payload file
    assert(back.rdd.getNumPartitions ===
      new java.io.File(dir).list().count(_.endsWith(".arrowbatch")))
  }

  test("DataSource V2 writer: overwrite and append through df.write") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2w").toString
    val nation = Tables.nation(spark, "/root/testdata/sf0.001")
    nation.write.format("graft.sources.arrowdir").mode("overwrite").save(dir)
    val once = spark.read.format("graft.sources.arrowdir").load(dir)
    assert(once.schema === nation.schema)
    assert(once.orderBy(col("n_nationkey")).collect().map(_.toSeq).toSeq ===
      nation.orderBy(col("n_nationkey")).collect().map(_.toSeq).toSeq)
    // append doubles the rows, keeping the first write's payloads
    nation.write.format("graft.sources.arrowdir").mode("append").save(dir)
    assert(spark.read.format("graft.sources.arrowdir").load(dir).count() === 2 * nation.count())
    // overwrite replaces everything (stale payloads swept at commit)
    nation.limit(5).write.format("graft.sources.arrowdir").mode("overwrite").save(dir)
    assert(spark.read.format("graft.sources.arrowdir").load(dir).count() === 5)
    // interop: the v1-style reader sees the v2 writer's layout
    assert(ArrowInterop.readBatchDir(spark, dir).count() === 5)
    // reported statistics: a small arrowdir side gets broadcast in a join
    val small = spark.read.format("graft.sources.arrowdir").load(dir)
    val fact = Tables.orders(spark, "/root/testdata/sf0.001")
    val joined = fact.join(small, fact("o_orderkey") === small("n_nationkey"))
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "size statistics not reported: small arrowdir side not broadcast")
    // append with a reordered/different schema must fail loudly, not
    // rewrite the sidecar under earlier payloads
    val mismatch = intercept[Exception] {
      nation.select(col("n_name"), col("n_nationkey"), col("n_regionkey"))
        .write.format("graft.sources.arrowdir").mode("append").save(dir)
    }
    assert(mismatch.getMessage.contains("does not match"),
      s"unexpected: ${mismatch.getMessage}")
    // reading a non-arrowdir directory is a clear error, not an empty frame
    val bogus = java.nio.file.Files.createTempDirectory("graft_notarrow").toString
    val err = intercept[Exception](
      spark.read.format("graft.sources.arrowdir").load(bogus).collect())
    assert(err.getMessage.contains("schema.json"), s"unexpected: ${err.getMessage}")
  }

  test("DataSource V2 filter pushdown: rows filtered in-reader, residual stays with Spark") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2f").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    orders.write.format("graft.sources.arrowdir").mode("overwrite").save(dir)
    val back = spark.read.format("graft.sources.arrowdir").load(dir)

    val filtered = back.filter(col("o_totalprice") > 100000.0 &&
      col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    val expect = orders.filter(col("o_totalprice") > 100000.0 &&
      col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    assert(filtered.count() === expect.count())
    assert(filtered.orderBy(col("o_orderkey")).collect().map(_.toSeq).toSeq ===
      expect.orderBy(col("o_orderkey")).collect().map(_.toSeq).toSeq)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(o_totalprice"),
      s"filters not pushed into the arrowdir scan:\n$plan")

    // timestamp literals translate too; a non-translatable predicate
    // (expression on the column) stays behind without breaking results
    val ts = back.filter(col("o_orderdate") >= "1997-06-01" &&
      length(col("o_orderpriority")) > 5)
    val tsExpect = orders.filter(col("o_orderdate") >= "1997-06-01" &&
      length(col("o_orderpriority")) > 5)
    assert(ts.count() === tsExpect.count())
  }

  test("round-trip preserves a real table incl. timestamps") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001").limit(100)
    val back = ArrowInterop.roundTrip(spark, orders)
    assert(back.count() === 100)
    assert(back.schema === orders.schema)
    // row-level equality (an aggregate would see a different partition
    // count after import and sum doubles in a different order)
    val a = orders.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    val b = back.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("compactBatchDir consolidates small payloads without changing rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    // 16 partitions → at least 16 small payload files (streaming-append shape)
    ArrowInterop.writeBatchDir(orders.repartition(16), dir)
    def payloads(): Int = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".arrowbatch"))
    val before = payloads()
    assert(before >= 16, s"expected many payloads, got $before")
    val expect = orders.orderBy(col("o_orderkey")).collect().map(_.toSeq).toSeq
    // huge target ⇒ everything packs into one payload group
    val n = ArrowInterop.compactBatchDir(spark, dir, targetBytes = 1L << 30)
    assert(n < before, s"no consolidation: $n of $before")
    assert(payloads() === n)
    val after = ArrowInterop.readBatchDir(spark, dir)
      .orderBy(col("o_orderkey")).collect().map(_.toSeq).toSeq
    assert(after === expect)
    // already-compact dirs no-op at the current count
    assert(ArrowInterop.compactBatchDir(spark, dir, targetBytes = 1L << 30) === n)
  }

  test("Arrow string-width tags survive the distributed round trip") {
    import graft.sources.ArrowInterop
    val df = Seq((1L, "a", "b"), (2L, "c", "d")).toDF("id", "s_small", "s_view")
    val tagged = ArrowInterop.withArrowStringWidth(df,
      Map("s_small" -> "utf8", "s_view" -> "utf8_view"))
    assert(ArrowInterop.arrowStringWidth(tagged, "s_small") === Some("utf8"))
    assert(ArrowInterop.arrowStringWidth(tagged, "id") === None)
    val back = ArrowInterop.roundTrip(spark, tagged)
    assert(ArrowInterop.arrowStringWidth(back, "s_view") === Some("utf8_view"))
    assert(back.orderBy(col("id")).collect().toSeq === tagged.orderBy(col("id")).collect().toSeq)
    intercept[IllegalArgumentException] {
      ArrowInterop.withArrowStringWidth(df, Map("s_small" -> "bogus"))
    }
  }

  test("table-level metadata map round-trips through parquet, batch dir, and Arrow") {
    val meta = Map("source" -> "unit-test", "version" -> "6", "owner" -> "graft")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val tagged = ArrowInterop.withTableMetadata(df, meta)
    assert(ArrowInterop.tableMetadata(tagged) === meta)
    assert(ArrowInterop.tableMetadata(df) === Map.empty)

    // parquet footer carries the full schema JSON and restores it on read
    val pq = java.nio.file.Files.createTempDirectory("graft_tmeta_pq").toString + "/t"
    tagged.write.parquet(pq)
    assert(ArrowInterop.tableMetadata(spark.read.parquet(pq)) === meta)

    // batch-dir sidecar (schema.json) path
    val dir = java.nio.file.Files.createTempDirectory("graft_tmeta_bd").toString
    ArrowInterop.writeBatchDir(tagged, dir)
    assert(ArrowInterop.tableMetadata(ArrowInterop.readBatchDir(spark, dir)) === meta)

    // Arrow record-batch round trip
    assert(ArrowInterop.tableMetadata(ArrowInterop.roundTrip(spark, tagged)) === meta)

    // merge semantics: later attach overrides same keys, keeps the rest
    val merged = ArrowInterop.withTableMetadata(tagged, Map("version" -> "7", "extra" -> "x"))
    assert(ArrowInterop.tableMetadata(merged) ===
      Map("source" -> "unit-test", "version" -> "7", "owner" -> "graft", "extra" -> "x"))
    // empty attach is a preserving no-op
    assert(ArrowInterop.tableMetadata(ArrowInterop.withTableMetadata(tagged, Map.empty)) === meta)
    // values survive untouched
    assert(tagged.orderBy(col("id")).collect().map(_.toSeq).toSeq ===
      df.orderBy(col("id")).collect().map(_.toSeq).toSeq)
  }
}
