package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Materializes via the `noop` sink so the full plan
  * (including projected columns) executes — `count()` would let Catalyst
  * prune away most of the computed work and under-report.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // Three full passes, per-query MIN. Pass 1 doubles as warmup: measured
    // decay on this box is 9.2 s -> 1.4 -> 0.9 -> 0.6 for the same query
    // (JVM JIT + codegen + first-parquet-footer costs), and the VM also
    // shows multi-second CPU-steal spikes (same query 3.6 s vs 31 s across
    // runs) — min() discards both cold starts and steal outliers.
    val passes = (1 to 3).map { _ =>
      SparkEntry.allDefs.map(q => q.name -> runOnce(q.name, q.fn)).toMap
    }
    val results = SparkEntry.allDefs.map { q =>
      val ts = passes.map(_(q.name)).filter(_ >= 0)
      q.name -> (if (ts.isEmpty) -1.0 else ts.min)
    }
    // The driver captures only the TAIL of stdout (~3 KB): rounds 1 and 2
    // both lost the head of the JSON line to that cap ("parsed": null in
    // BENCH_r0{1,2}.json). Two defenses: (a) the stdout line uses SHORT
    // query keys — the "qNN" prefix before the first underscore — cutting
    // the line to ~1.3 KB so it fits whole; (b) the full-name line still
    // goes to BENCH_LOCAL.json for humans.
    def r4(v: Double): Double = math.rint(v * 10000) / 10000
    // duplicate short keys would silently drop a timing at the JSON parser
    // (last key wins) — fall back to full names if prefixes ever collide
    val shortKeys = results.map(_._1.takeWhile(_ != '_'))
    val shortOk = shortKeys.distinct.length == shortKeys.length
    def queriesJson(short: Boolean): String = results.map { case (k, v) =>
      val key = if (short && shortOk) k.takeWhile(_ != '_') else k
      "\"" + key + "\":" + r4(v)
    }.mkString("{", ",", "}")
    val total = r4(results.map(_._2).filter(_ >= 0).sum)

    // Micro-benchmarks matching the reference's own published workload
    // (BASELINE.md: sum of 1e9 i64/f64, SIMD+Rayon on 22 cores = ~114 ms).
    // Here: Tungsten whole-stage-codegen sum over spark.range / a cast.
    import org.apache.spark.sql.functions._
    def timeMin2(f: => Unit): Double = {
      def once: Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      once; math.min(once, once)
    }
    val n = 1000000000L
    val sumI64 = timeMin2(spark.range(n).agg(sum(col("id"))).collect())
    val sumF64 = timeMin2(spark.range(n).agg(sum(col("id").cast("double"))).collect())
    val micro = s"""{"sum_1e9_i64_sec":${r4(sumI64)},"sum_1e9_f64_sec":${r4(sumF64)},""" +
      s""""i64_gelems_per_sec":${r4(n / sumI64 / 1e9)},"f64_gelems_per_sec":${r4(n / sumF64 / 1e9)}}"""

    def line(short: Boolean): String =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${queriesJson(short)},"micro":$micro,"sf":"$sfDir"}"""
    println(line(short = true))
    // full names go to the file (stdout capture truncates long lines, which
    // cost rounds 1-2 their per-query timings)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line(short = false) + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    spark.stop()
  }
}
