package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the probe-pruned incremental near-dedup index:
  * ingest N history epochs, then time a small fixed-size increment two
  * ways on the SAME index — (a) `pruned`: the at-rest band family
  * present (bucket-partition-pruned probe), (b) `legacy`: the band
  * family removed, forcing the derive-from-state fallback, which reads
  * the FULL signature index per increment exactly like the pre-round-14
  * layout did. The (b)/(a) ratio is the measured IO win; (a) across
  * growing history measures how per-trigger cost scales with history.
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

    // stripBands: delete the band family BEFORE EVERY PASS (each
    // increment re-appends its own epoch's bands, which would make
    // passes 2..N partially probe-routed and bias the "legacy" min low)
    def timeIncrement(startEpoch: Long, stripBands: Boolean): Double =
      (0 until passes).map { p =>
        if (stripBands)
          graft.ops.Layout.deleteRecursively(java.nio.file.Paths.get(dir, "bands"))
        val t0 = System.nanoTime()
        graft.llm.Dedup.nearDedupIncrement(batch, "doc_id", "text", dir, 0.5,
            epoch = startEpoch + p)
          .write.format("noop").mode("overwrite").save()
        graft.ops.CacheRegistry.releaseAll()
        (System.nanoTime() - t0) / 1e9
      }.min

    val prunedSec = timeIncrement(1000, stripBands = false)
    // strip the band family -> the derive-from-state fallback IS the old
    // full-scan layout (same candidates, same decisions; LlmSpec pins it)
    val legacySec = timeIncrement(2000, stripBands = true)

    val stateBytes = {
      val p = java.nio.file.Paths.get(dir, "state")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size).sum
    }
    println(s"""{"tool":"probe-scale","sf_dir":"$sfDir","epochs":$epochs,""" +
      s""""batch_rows":${batch.count()},"state_bytes":$stateBytes,""" +
      s""""pruned_sec":$prunedSec,"legacy_sec":$legacySec,""" +
      s""""ratio":${legacySec / prunedSec}}""")
    graft.ops.Layout.deleteRecursively(java.nio.file.Paths.get(dir))
    spark.stop()
  }
}
