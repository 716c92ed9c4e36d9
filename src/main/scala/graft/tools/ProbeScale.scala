package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the probe-pruned incremental near-dedup index:
  * ingest N history epochs, then run a small fixed-size increment two
  * ways on the SAME index — (a) `pruned`: the at-rest band family
  * present (bucket row-group-pruned probe), (b) `legacy`: the band
  * family removed, forcing the derive-from-state fallback, which reads
  * the FULL signature index per increment exactly like the pre-round-14
  * layout did.
  *
  * Measures BOTH wall time and task input bytesRead per increment
  * (InputBytesMeter). bytesRead is the honest scale signal: on warm
  * local NVMe the wall clocks sit at parity, but the pruned scan's
  * per-trigger IO must track the BATCH's band set while the fallback's
  * grows with history — the (b)/(a) bytes ratio and the pruned-bytes-
  * vs-epochs curve across runs are the structural claim as a number.
  *
  * FAIRNESS: the index directory is snapshotted once after ingest and
  * restored before every timed pass, so each pass (and both
  * configurations) measures the IDENTICAL index content — without the
  * restore, earlier passes' appended epochs inflate later passes'
  * history (the exact bias a pruned-first ordering had).
  *
  * Usage: runMain graft.tools.ProbeScale <sfDir> <epochs> <passes>
  * Prints one JSON line.
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val epochs = args(1).toInt
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-scale")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(sfDir + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    // history = epochs slices by doc_id mod (epochs + 1); the timed
    // increment is the LAST slice, truncated to a small fixed batch so
    // per-trigger cost is dominated by index IO, not batch work
    val mod = epochs + 1
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_scale_").toString
    for (e <- 0 until epochs) {
      graft.llm.Dedup.nearDedupIncrement(
        docs.filter(pmod(col("doc_id"), lit(mod)) === e),
        "doc_id", "text", dir, 0.5, epoch = e).write.format("noop")
        .mode("overwrite").save()
      graft.ops.CacheRegistry.releaseAll()
    }
    val batch = docs.filter(pmod(col("doc_id"), lit(mod)) === epochs)
      .limit(500).persist()
    batch.count()

    // snapshot the ingested index once; every timed pass restores it
    val snap = dir + "_snap"
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
    def copyDir(from: String, to: String): Unit = {
      graft.ops.Layout.deleteRecursively(java.nio.file.Paths.get(to))
      org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(from),
        fs, new org.apache.hadoop.fs.Path(to), false, hconf)
    }
    copyDir(dir, snap)

    // stripBands: delete the band family -> the derive-from-state
    // fallback IS the old full-scan layout (same candidates, same
    // decisions; LlmSpec pins the equivalence)
    def timeIncrement(startEpoch: Long, stripBands: Boolean): (Double, Long) =
      (0 until passes).map { p =>
        copyDir(snap, dir)
        if (stripBands)
          graft.ops.Layout.deleteRecursively(java.nio.file.Paths.get(dir, "bands"))
        val t0 = System.nanoTime()
        // accurate variant: parquet vectored IO bypasses FS statistics
        // (footer-only counts) — see InputBytesMeter's scaladoc
        val (_, bytes) = graft.ops.InputBytesMeter.measureWithAccurateParquetIO(spark) {
          graft.llm.Dedup.nearDedupIncrement(batch, "doc_id", "text", dir, 0.5,
              epoch = startEpoch + p)
            .write.format("noop").mode("overwrite").save()
        }
        graft.ops.CacheRegistry.releaseAll()
        ((System.nanoTime() - t0) / 1e9, bytes)
      }.minBy(_._1)

    val (prunedSec, prunedBytes) = timeIncrement(1000, stripBands = false)
    val (legacySec, legacyBytes) = timeIncrement(2000, stripBands = true)

    def treeBytes(sub: String): Long = {
      val p = java.nio.file.Paths.get(dir, sub)
      if (!java.nio.file.Files.exists(p)) 0L
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      }
    }
    // restore once more so the reported at-rest sizes are the snapshot's
    copyDir(snap, dir)
    val stateBytes = treeBytes("state")
    val bandsBytes = treeBytes("bands")
    println(s"""{"tool":"probe-scale","sf_dir":"$sfDir","epochs":$epochs,""" +
      s""""batch_rows":${batch.count()},"state_bytes":$stateBytes,""" +
      s""""bands_bytes":$bandsBytes,""" +
      s""""pruned_sec":$prunedSec,"legacy_sec":$legacySec,""" +
      s""""pruned_read_bytes":$prunedBytes,"legacy_read_bytes":$legacyBytes,""" +
      s""""sec_ratio":${legacySec / prunedSec},""" +
      s""""bytes_ratio":${legacyBytes.toDouble / math.max(1L, prunedBytes)}}""")
    graft.ops.Layout.deleteRecursively(java.nio.file.Paths.get(dir))
    graft.ops.Layout.deleteRecursively(java.nio.file.Paths.get(snap))
    spark.stop()
  }
}
