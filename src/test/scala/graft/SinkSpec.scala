package graft

import org.apache.spark.sql.functions._

/** Sink-side scale mechanics: partitioned parquet layout + partition
  * pruning, and the typed Dataset endpoint (SURVEY §1.3).
  */
class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy sink + partition-pruned scan") {
    import graft.sources.Sinks
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    Sinks.writePartitioned(Tables.events(spark, "/root/testdata/sf0.001"), out, Seq("event_type"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("event_type=")) === 5)
    val pruned = Sinks.readPartitioned(spark, out).filter(col("event_type") === "signup")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), s"no partition pruning:\n$plan")
    assert(pruned.count() === Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "signup").count())
  }

  test("typed Dataset endpoint: case-class rows with compile-time fields") {
    val ds = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .as[(Long, Double, String)]
    val byFlag = ds.filter(_._2 > 25.0).groupByKey(_._3).count().collect().toMap
    val sqlCounts = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .filter(col("l_quantity") > 25).groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFlag === sqlCounts)
  }

  test("typed cogroup: per-key two-sided imperative merge equals the relational form") {
    // KeyValueGroupedDataset.cogroup — the typed two-input leg of §1.3
    // (mapGroups covers one input; joins cover relational merges; cogroup
    // is for per-key logic that genuinely needs both iterators at once)
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_custkey"), col("o_totalprice")).as[(Long, Double)]
      .groupByKey(_._1)
    val cust = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey"), col("c_acctbal")).as[(Long, Double)]
      .groupByKey(_._1)
    val merged = cust.cogroup(orders) { (k, cs, os) =>
      val bal = cs.map(_._2).toSeq
      val ov = os.map(_._2).toSeq // iterators are single-pass: materialize
      if (bal.isEmpty) Iterator.empty // orders without a customer row: drop
      else Iterator((k, bal.head, ov.sum, ov.size.toLong))
    }.toDF("custkey", "acctbal", "order_total", "n_orders")
    val relational = Tables.customer(spark, "/root/testdata/sf0.001")
      .join(Tables.orders(spark, "/root/testdata/sf0.001"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey").as("custkey"))
      .agg(first(col("c_acctbal")).as("acctbal"),
        coalesce(sum(col("o_totalprice")), lit(0.0)).as("order_total"),
        count(col("o_orderkey")).as("n_orders"))
    val a = merged.collect().map(r => (r.getLong(0), r.getDouble(1),
      math.round(r.getDouble(2) * 100), r.getLong(3))).toSet
    val b = relational.collect().map(r => (r.getLong(0), r.getDouble(1),
      math.round(r.getDouble(2) * 100), r.getLong(3))).toSet
    assert(a === b)
  }

  test("z-order clustering bounds per-file spread on every clustered dimension") {
    import graft.ops.ZOrder
    val part = Tables.part(spark, "/root/testdata/sf0.01")
      .select(col("p_partkey"), col("p_size"), (col("p_partkey") % 256).as("pk8"))

    def perFileSpread(dir: String, dim: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length >= 4, s"expected several files, got ${files.length}")
      val spreads = files.map { f =>
        val r = spark.read.parquet(f).agg(
          (max(col(dim)) - min(col(dim))).cast("double")).collect()(0)
        if (r.isNullAt(0)) 0.0 else r.getDouble(0)
      }
      spreads.sum / spreads.length
    }

    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    // normalize p_size (1..50) to the full 8-bit lane (×5 → 5..250): with
    // unequal effective widths the wider dim monopolizes the high
    // interleave bits and the narrow dim gets no locality at all
    ZOrder.clusterWrite(part, Seq(col("p_size") * 5, col("pk8")), numFiles = 16, zDir, bits = 8)
    val rDir = java.nio.file.Files.createTempDirectory("graft_zorder_rand_").toString
    part.repartition(16, col("p_partkey")).write.mode("overwrite").parquet(rDir)

    // a hash layout gives every file ~the global spread on both dims; the
    // z-layout must confine BOTH dims well below it (that confinement is
    // exactly what parquet min/max footer pruning exploits)
    for (dim <- Seq("p_size", "pk8")) {
      val zs = perFileSpread(zDir, dim)
      val rs = perFileSpread(rDir, dim)
      assert(zs < rs * 0.6, s"$dim: z-clustered spread $zs not < 0.6 × hash spread $rs")
    }
    // identity: clustering rewrites layout, never rows
    val a = spark.read.parquet(zDir).orderBy(col("p_partkey")).collect().map(_.toSeq).toSeq
    val b = part.orderBy(col("p_partkey")).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("quantile normalization fills the z lane uniformly on skewed data") {
    import graft.ops.ZOrder
    import spark.implicits._
    // heavy right skew: x^4 over [0,1) — raw values leave the upper lane
    // almost empty; quantile ranks must spread uniformly
    val vals = (0 until 4096).map(i => math.pow(i / 4096.0, 4)).toDF("x")
    val cuts = ZOrder.quantileCuts(vals, "x", bits = 6)
    assert(cuts.length === 63)
    val ranks = vals.select(ZOrder.quantileRank(col("x"), cuts).as("r"))
      .collect().map(_.getInt(0))
    assert(ranks.min === 0 && ranks.max === 63)
    // every octant of the lane gets its ~1/8 share (±30% for sketch error)
    val perOctant = ranks.groupBy(_ / 8).view.mapValues(_.length).toMap
    for (o <- 0 until 8) {
      val share = perOctant.getOrElse(o, 0).toDouble / ranks.length
      assert(share > 0.125 * 0.7 && share < 0.125 * 1.3, s"octant $o share $share")
    }
    // clusterByQuantile keeps rows intact
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val clustered = ZOrder.clusterByQuantile(li, Seq("l_extendedprice", "l_partkey"), 8)
    assert(clustered.count() === li.count())
  }

  test("optimizePartitioned: O(partition) rewrite — rows preserved, files bounded, z-local, incremental, crash-healing") {
    import graft.ops.ZOrder
    val dir = java.nio.file.Files.createTempDirectory("graft_opt_").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
    li.repartition(6).write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
    def snapshot() = spark.read.parquet(dir)
      .orderBy("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_returnflag")
      .collect().map(_.toSeq).toSeq
    val before = snapshot()
    val done = ZOrder.optimizePartitioned(spark, dir, "l_returnflag",
      Seq("l_partkey", "l_suppkey"), filesPerPartition = 8)
    assert(done.toSet === Set("l_returnflag=A", "l_returnflag=N", "l_returnflag=R"))
    assert(snapshot() === before, "OPTIMIZE must rewrite layout, never rows")
    val partDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("l_returnflag=")).sortBy(_.getName)
    for (p <- partDirs) {
      val data = p.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(data.length <= 8, s"${p.getName}: ${data.length} files > filesPerPartition")
      assert(p.listFiles().exists(_.getName == "_GRAFT_OPTIMIZED"), s"${p.getName}: no marker")
      // within-partition z-locality, bounded by the interleave geometry:
      // 8 files = 3 z-prefix bits over 2 dims → the SECOND dim holds the
      // top bit plus one more (~1/4 spread), the first dim one bit
      // (~1/2 spread). Assert each with margin over its theoretical
      // confinement (a hash layout gives ~1.0 on both) — a flat 0.6 on
      // dim0 sits exactly ON the 1-bit bound and flakes on quantile
      // noise.
      for ((dim, bound) <- Seq("l_partkey" -> 0.8, "l_suppkey" -> 0.55)) {
        val spreads = data.map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg((max(col(dim)) - min(col(dim))).cast("double")).collect()(0)
          if (r.isNullAt(0)) 0.0 else r.getDouble(0)
        }
        val whole = spark.read.parquet(p.getPath)
          .agg((max(col(dim)) - min(col(dim))).cast("double"))
          .collect()(0).getDouble(0)
        assert(spreads.sum / spreads.length < whole * bound,
          s"${p.getName}/$dim: per-file spread not confined " +
            s"(${spreads.sum / spreads.length} vs $whole, bound $bound)")
      }
    }
    // INCREMENTAL: a second run sees fresh markers and rewrites nothing
    assert(ZOrder.optimizePartitioned(spark, dir, "l_returnflag",
      Seq("l_partkey", "l_suppkey"), filesPerPartition = 8) === Seq.empty)
    // new data in ONE partition → exactly that partition rewrites.
    // No mtime sleep needed: staleness is SET-based (marker records the
    // optimized layout's file names), so an append in the same
    // filesystem timestamp tick is still seen.
    li.filter(col("l_returnflag") === "A").drop("l_returnflag").limit(100)
      .coalesce(1).write.mode("append").parquet(dir + "/l_returnflag=A")
    val inc = ZOrder.optimizePartitioned(spark, dir, "l_returnflag",
      Seq("l_partkey", "l_suppkey"), filesPerPartition = 8)
    assert(inc === Seq("l_returnflag=A"), s"expected only the appended partition, got $inc")
    val afterAppend = snapshot()
    // CRASH HEALING: (a) retired-without-live (crash between the two
    // renames, stage incomplete) rolls back; (b) leftover retired beside
    // a live partition is swept
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveA = new org.apache.hadoop.fs.Path(dir, "l_returnflag=A")
    val retiredA = new org.apache.hadoop.fs.Path(dir + "/.__graft_optimize_retired/l_returnflag=A")
    fs.mkdirs(retiredA.getParent)
    require(fs.rename(liveA, retiredA))
    ZOrder.recoverOptimize(spark, dir)
    assert(fs.exists(liveA) && !fs.exists(retiredA), "rollback recovery failed")
    assert(snapshot() === afterAppend, "recovery lost rows")
    fs.mkdirs(retiredA) // leftover beside a live partition
    ZOrder.recoverOptimize(spark, dir)
    assert(fs.exists(liveA) && !fs.exists(retiredA), "leftover sweep failed")
    assert(snapshot() === afterAppend)
    // LATE-FILE RESCUE: a file appended DURING a rewrite sits in the
    // retired copy but not in the landed inputs manifest — recovery (and
    // the swap itself) must move it back into the partition, never
    // delete committed rows with the retired copy
    val nBefore = spark.read.parquet(dir).count()
    val lateSrc = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("l_returnflag=N")).head.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    fs.mkdirs(retiredA)
    require(fs.rename(
      new org.apache.hadoop.fs.Path(lateSrc.getPath),
      new org.apache.hadoop.fs.Path(retiredA, "part-late-append.parquet")))
    val nMoved = nBefore - spark.read.parquet(dir).count()
    assert(nMoved > 0)
    ZOrder.recoverOptimize(spark, dir)
    assert(!fs.exists(retiredA))
    assert(spark.read.parquet(dir).count() === nBefore,
      "late-appended file vanished with the retired copy")
    graft.ops.Layout.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("recoverOptimize conflict window: live recreated mid-swap without a manifest rescues the retired originals") {
    import graft.ops.ZOrder
    import spark.implicits._
    // the window: retire rename done, land rename NOT done, and a
    // concurrent append recreated the live directory in between — live
    // holds ONLY the stray append, the retired copy holds the
    // partition's only original rows, the completed rewrite sits in
    // stage. Recovery must merge the originals back (not delete them
    // with the retired copy), keep the append, and discard the stage
    // (the partition re-optimizes later since no marker landed).
    val dir = java.nio.file.Files.createTempDirectory("graft_opt_conflict_").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orig = (1L to 50L).map(i => (i, i * 2)).toDF("k", "v")
    orig.coalesce(2).write.parquet(dir + "/p=A")
    val live = new org.apache.hadoop.fs.Path(dir, "p=A")
    val retired = new org.apache.hadoop.fs.Path(dir + "/.__graft_optimize_retired/p=A")
    val stage = new org.apache.hadoop.fs.Path(dir + "/.__graft_optimize_stage/p=A")
    val inputNames = fs.listStatus(live).map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet
    // stage: a complete rewrite of the originals, manifest included
    orig.coalesce(1).write.parquet(stage.toString)
    val manifest = new org.apache.hadoop.fs.Path(stage, "_GRAFT_INPUTS")
    val out = fs.create(manifest, true)
    out.write(inputNames.toSeq.sorted.mkString("\n").getBytes("UTF-8")); out.close()
    // retire, then the concurrent append recreates live before the land
    fs.mkdirs(retired.getParent)
    require(fs.rename(live, retired))
    val stray = Seq((1000L, 0L)).toDF("k", "v")
    stray.coalesce(1).write.parquet(live.toString)
    ZOrder.recoverOptimize(spark, dir)
    assert(!fs.exists(retired), "retired copy not cleaned")
    assert(!fs.exists(stage), "stage not swept")
    val got = spark.read.parquet(live.toString).select(col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = ((1L to 50L).map(i => (i, i * 2)) :+ (1000L, 0L)).sorted
    assert(got === want,
      "conflict recovery must keep originals + the stray append, exactly once each")
    // no marker landed → the partition is stale and re-optimizes next run
    assert(!fs.exists(new org.apache.hadoop.fs.Path(live, "_GRAFT_OPTIMIZED")))
    graft.ops.Layout.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("optimizePartitioned maxConcurrent: parallel partition rewrites match the serial result") {
    import graft.ops.ZOrder
    val dir = java.nio.file.Files.createTempDirectory("graft_opt_conc_").toString
    val dirSerial = java.nio.file.Files.createTempDirectory("graft_opt_ser_").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
    for (d <- Seq(dir, dirSerial))
      li.repartition(4).write.partitionBy("l_returnflag").mode("overwrite").parquet(d)
    def snapshot(d: String) = spark.read.parquet(d)
      .orderBy("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_returnflag")
      .collect().map(_.toSeq).toSeq
    val done = ZOrder.optimizePartitioned(spark, dir, "l_returnflag",
      Seq("l_partkey", "l_suppkey"), filesPerPartition = 4, maxConcurrent = 3)
    val doneSerial = ZOrder.optimizePartitioned(spark, dirSerial, "l_returnflag",
      Seq("l_partkey", "l_suppkey"), filesPerPartition = 4)
    assert(done.toSet === doneSerial.toSet)
    assert(snapshot(dir) === snapshot(dirSerial),
      "concurrent OPTIMIZE must preserve exactly the serial row set")
    // markers landed for every partition; a second concurrent run is a no-op
    assert(ZOrder.optimizePartitioned(spark, dir, "l_returnflag",
      Seq("l_partkey", "l_suppkey"), filesPerPartition = 4, maxConcurrent = 3) === Seq.empty)
    for (d <- Seq(dir, dirSerial))
      graft.ops.Layout.deleteRecursively(java.nio.file.Paths.get(d))
  }

  test("mergeUpsert rewrites only touched partitions and merges exactly") {
    import graft.sources.Sinks
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_").toString
    val base = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).cast("int").as("o_year"))
    base.write.mode("overwrite").partitionBy("o_year").parquet(dir)
    // updates touch ONE year: bump prices of its even keys + add new keys
    val years = base.select(col("o_year")).distinct()
      .collect().map(_.getInt(0)).sorted
    val (touched, untouched) = (years.head, years.last)
    val mods = base.filter(col("o_year") === touched && col("o_orderkey") % 2 === 0)
    val updates = mods.withColumn("o_totalprice", col("o_totalprice") + 1)
      .unionByName(mods.withColumn("o_orderkey", col("o_orderkey") + 5000000L))
    def files(y: Int) = new java.io.File(s"$dir/o_year=$y").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    val before = files(untouched)
    Sinks.mergeUpsert(spark, dir, updates, Seq("o_orderkey"), "o_year")
    // untouched partition: identical files, identical mtimes — never rewritten
    assert(files(untouched) === before, "untouched partition was rewritten")
    // merged content == relational merge
    val expect = updates.unionByName(
        base.join(updates.select(col("o_orderkey")).distinct(), Seq("o_orderkey"), "left_anti"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).sorted.toSeq
    val got = spark.read.parquet(dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_year"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).sorted.toSeq
    assert(got === expect)
  }

  test("mergeUpsert into a NULL partition keeps its unmatched rows (no silent loss)") {
    import graft.sources.Sinks
    import spark.implicits._
    // isin() never matches NULL: without the null-safe read, the NULL
    // partition is NOT read into the merge while the dynamic overwrite
    // still REPLACES it (the updates carry NULL rows) — every unmatched
    // row it held would vanish. The worst merge failure mode: data loss.
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_null_").toString + "/t"
    Seq((1L, 10.0, Some("a")), (2L, 20.0, None), (3L, 30.0, None))
      .map { case (k, v, p) => (k, v, p.orNull) }
      .toDF("id", "v", "p")
      .write.partitionBy("p").parquet(dir)
    // update key 2 (NULL partition) and add key 4 (NULL partition);
    // key 3 in the NULL partition is UNTOUCHED and must survive
    val updates = Seq((2L, 21.0, null.asInstanceOf[String]),
      (4L, 40.0, null.asInstanceOf[String])).toDF("id", "v", "p")
    Sinks.mergeUpsert(spark, dir, updates, Seq("id"), "p")
    val got = spark.read.parquet(dir).select(col("id"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 10.0, 2L -> 21.0, 3L -> 30.0, 4L -> 40.0),
      s"NULL-partition merge lost or mangled rows: $got")
  }

  test("stats manifest prunes files on a sorted layout without losing rows") {
    import graft.sources.Sinks
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_prune_").toString
    // range-sorted layout on the prune column: each file covers a narrow
    // l_partkey band, so a box query should drop most files at the manifest
    li.repartitionByRange(8, col("l_partkey")).sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(dir)
    val manifest = Sinks.statsManifest(spark, dir, Seq("l_partkey")).collect()
    val nFiles = manifest.length
    assert(nFiles >= 8, s"expected >=8 files, got $nFiles")
    val (lo, hi) = (10L, 30L)
    val overlapping = manifest.count { r =>
      val mn = r.getAs[Long]("min_l_partkey"); val mx = r.getAs[Long]("max_l_partkey")
      !(mx < lo || mn > hi)
    }
    assert(overlapping < nFiles / 2, s"no skipping: $overlapping of $nFiles files overlap")
    // equality: pruned read ≡ full-scan filter
    val pruned = Sinks.readPruned(spark, dir, "l_partkey", lo, hi)
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    val full = li.filter(col("l_partkey").between(lo, hi))
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    assert(pruned === full)
    // disjoint range: zero files kept, empty result, schema preserved
    val none = Sinks.readPruned(spark, dir, "l_partkey", 10000000L, 20000000L)
    assert(none.count() === 0L)
    assert(none.columns.toSeq === li.columns.toSeq)
  }

  test("manifest pruning filters distributed: driver only sees surviving files") {
    import graft.sources.Sinks
    val dir = java.nio.file.Files.createTempDirectory("graft_prune2").toString + "/t"
    spark.range(0, 4000).selectExpr("id AS k", "id % 13 AS v")
      .repartitionByRange(8, col("k")).write.parquet(dir)
    // the survivor computation is a DataFrame: the range-overlap predicate
    // is a Catalyst Filter over the manifest aggregate, so it executes on
    // executors — the driver never materializes the full (file, stats) list
    val survivors = Sinks.prunedFiles(spark, dir, "k", 0L, 400L)
    val plan = survivors.queryExecution.optimizedPlan.toString
    assert(plan.contains("Filter"), s"overlap test not pushed into the plan:\n$plan")
    val nAll = spark.read.parquet(dir).inputFiles.length
    val nKeep = survivors.count()
    assert(nKeep < nAll, s"no skipping: $nKeep of $nAll")
    // and the pruned read still equals the full-scan filter
    val a = Sinks.readPruned(spark, dir, "k", 0L, 400L).orderBy("k").collect().toSeq
    val b = spark.read.parquet(dir).filter(col("k").between(0, 400)).orderBy("k").collect().toSeq
    assert(a === b)
  }

  test("persisted manifest: pruned read path never scans the table") {
    import graft.sources.Sinks
    val dir = java.nio.file.Files.createTempDirectory("graft_prune3").toString + "/t"
    spark.range(0, 4000).selectExpr("id AS k", "id % 13 AS v")
      .repartitionByRange(8, col("k")).write.parquet(dir)
    // footer-built persisted stats must agree exactly with the scan-built ones
    val scanStats = Sinks.statsManifest(spark, dir, Seq("k")).collect()
      .map(r => (new java.io.File(r.getString(0).stripPrefix("file:")).getName,
        r.getAs[Long]("n_rows"), r.getAs[Long]("min_k"), r.getAs[Long]("max_k"))).sorted.toSeq
    Sinks.writeStatsManifest(spark, dir, Seq("k"))
    val stored = Sinks.storedManifest(spark, dir).get
    val storedStats = stored.collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_rows"),
        r.getAs[Long]("min_k"), r.getAs[Long]("max_k"))).sorted.toSeq
    assert(storedStats === scanStats)
    // THE point of persistence: every file the pruning plan reads lives
    // under the _graft_stats sidecar — zero data files, i.e. no table scan
    val pruningInputs = Sinks.prunedFiles(spark, dir, "k", 0L, 400L).inputFiles
    assert(pruningInputs.nonEmpty && pruningInputs.forall(_.contains(Sinks.ManifestDir)),
      s"pruning path read data files: ${pruningInputs.mkString(", ")}")
    // result equality through the stored-manifest path
    val a = Sinks.readPruned(spark, dir, "k", 0L, 400L).orderBy("k").collect().toSeq
    val b = spark.read.parquet(dir).filter(col("k").between(0, 400)).orderBy("k").collect().toSeq
    assert(a === b)
    // and it actually skips: the pruned read plans fewer files than exist
    assert(Sinks.readPruned(spark, dir, "k", 0L, 400L).inputFiles.length <
      spark.read.parquet(dir).inputFiles.length)
  }

  test("stale persisted manifest fails loudly instead of mispruning") {
    import graft.sources.Sinks
    val dir = java.nio.file.Files.createTempDirectory("graft_prune4").toString + "/t"
    spark.range(0, 1000).selectExpr("id AS k").repartitionByRange(4, col("k"))
      .write.parquet(dir)
    Sinks.writeStatsManifest(spark, dir, Seq("k"))
    // new data lands without a manifest rewrite → the manifest is a lie
    spark.range(5000, 6000).selectExpr("id AS k").coalesce(1)
      .write.mode("append").parquet(dir)
    val ex = intercept[IllegalStateException] {
      Sinks.readPruned(spark, dir, "k", 0L, 400L).collect()
    }
    assert(ex.getMessage.contains("STALE"))
    // rewriting the manifest heals it, and the new rows are visible
    Sinks.writeStatsManifest(spark, dir, Seq("k"))
    assert(Sinks.readPruned(spark, dir, "k", 5000L, 5100L).count() === 101L)
    // an in-place rewrite that KEEPS file names must also invalidate:
    // the fingerprint covers length+mtime, not names alone
    val dataFile = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    assert(dataFile.setLastModified(dataFile.lastModified() + 60000))
    val ex2 = intercept[IllegalStateException] {
      Sinks.readPruned(spark, dir, "k", 0L, 400L).collect()
    }
    assert(ex2.getMessage.contains("STALE"))
  }

  test("deleteByKeys: partition-limited rewrite, untouched files keep mtimes, emptied partition removed") {
    import graft.sources.Sinks
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_del_").toString + "/t"
    val rows = Seq(
      (1L, "a", "one"), (2L, "a", "two"), (3L, "a", "three"),
      (10L, "b", "ten"), (11L, "b", "eleven"),
      (20L, "c", "twenty")).toDF("id", "p", "v")
    Sinks.writePartitioned(rows, dir, Seq("p"))
    def files(part: String) = {
      val d = java.nio.file.Paths.get(dir, s"p=$part")
      scala.util.Using.resource(java.nio.file.Files.list(d)) { s =>
        s.toArray.map(_.toString).filter(_.endsWith(".parquet"))
          .map(f => f -> java.nio.file.Files.getLastModifiedTime(
            java.nio.file.Paths.get(f)).toMillis).sorted.toSeq
      }
    }
    val bFilesBefore = files("b")
    Thread.sleep(1100) // mtime resolution guard
    // delete: one row from a, ALL of c, an absent key (no-op)
    val audit = Sinks.deleteByKeys(spark, dir,
        Seq(2L, 20L, 999L).toDF("id"), Seq("id"), "p")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(audit === Map("a" -> ((3L, 1L, 2L)), "c" -> ((1L, 1L, 0L))))
    // partition b held no doomed key: its FILES must be untouched
    assert(files("b") === bFilesBefore, "untouched partition was rewritten")
    // fully-emptied partition directory is gone (dynamic overwrite alone
    // would have left its old files alive)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "p=c")))
    // read-back: survivors only, absent-key delete was a no-op
    val back = Sinks.readPartitioned(spark, dir)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(back === Set(1L, 3L, 10L, 11L))
    // deleting from a table with NO hits returns an empty audit and
    // touches nothing
    val none = Sinks.deleteByKeys(spark, dir, Seq(777L).toDF("id"), Seq("id"), "p")
    assert(none.count() === 0L)
    assert(files("b") === bFilesBefore)
  }

  test("deleteByKeys: emptied partitions with Hive-escaped values are physically removed") {
    import graft.sources.Sinks
    import spark.implicits._
    // values whose Hive dir encoding differs from URL encoding: a space
    // (Hive keeps it literal; URL encoding would emit '+'), a '*' (Hive
    // writes %2A; URL keeps '*'), and NULL (__HIVE_DEFAULT_PARTITION__).
    // The right-to-be-forgotten contract is PHYSICAL removal — a
    // mis-encoded delete target silently resurrects the rows on read.
    val dir = java.nio.file.Files.createTempDirectory("graft_del_esc_").toString + "/t"
    Seq((1L, Some("has space"), "x"), (2L, Some("st*r"), "y"),
        (3L, Option.empty[String], "z"), (4L, Some("keep"), "w"))
      .toDF("id", "p", "v")
      .write.partitionBy("p").parquet(dir)
    for (d <- Seq("p=has space", "p=st%2Ar", "p=__HIVE_DEFAULT_PARTITION__"))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, d)),
        s"fixture layout surprise: $d missing")
    val audit = Sinks.deleteByKeys(spark, dir,
      Seq(1L, 2L, 3L).toDF("id"), Seq("id"), "p")
    assert(audit.filter(col("n_after") === 0).count() === 3L)
    for (d <- Seq("p=has space", "p=st%2Ar", "p=__HIVE_DEFAULT_PARTITION__"))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, d)),
        s"emptied partition dir survived the delete: $d")
    val back = spark.read.parquet(dir).select(col("id")).collect().map(_.getLong(0)).toSet
    assert(back === Set(4L), s"deleted rows resurrected: $back")
  }

  test("deleteByKeys: emptied TIMESTAMP partition dir is rendered the writer's way and removed") {
    import graft.sources.Sinks
    import spark.implicits._
    // java.sql.Timestamp.toString renders '...00:00:00.0'; the writer's
    // dir name uses Spark's Cast-to-string ('...00:00:00', ':' → %3A).
    // A String.valueOf-built delete target misses the dir and the
    // "deleted" rows resurrect on read.
    val dir = java.nio.file.Files.createTempDirectory("graft_del_ts_").toString + "/t"
    val ts0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2020-06-15 12:30:00")
    Seq((1L, ts0, "a"), (2L, ts0, "b"), (3L, ts1, "c")).toDF("id", "p", "v")
      .write.partitionBy("p").parquet(dir)
    val before = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("p="))
    assert(before.length === 2 && before.forall(!_.contains(".0")),
      s"fixture layout surprise: ${before.toSeq}")
    val audit = Sinks.deleteByKeys(spark, dir, Seq(1L, 2L).toDF("id"), Seq("id"), "p")
      .collect()
    assert(audit.length === 1 && audit(0).getLong(3) === 0L)
    val after = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("p="))
    assert(after.toSeq.length === 1 && after(0).contains("2020-06-15"),
      s"emptied timestamp partition survived: ${after.toSeq}")
    val back = spark.read.parquet(dir).select(col("id")).collect().map(_.getLong(0)).toSet
    assert(back === Set(3L), s"deleted rows resurrected: $back")
  }
}
