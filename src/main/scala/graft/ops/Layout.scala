package graft.ops

/** At-rest layout helpers shared by the incremental writers (dedup
  * signature index, IVF index, compaction).
  */
object Layout {

  /** Writer parallelism sized to data volume: ~`rowsPerFile` rows per
    * output file, clamped to [1, 32]. A shuffle-parallelism write of a
    * small increment leaves dozens of near-empty files whose per-file
    * open cost every later scan pays forever — the small-file problem
    * all table formats fight.
    */
  def sizedFileCount(rows: Long, rowsPerFile: Long = 500000L): Int =
    math.max(1L, math.min(32L, rows / rowsPerFile + 1L)).toInt

  /** Shuffle/state parallelism sized to an on-disk source's volume: one
    * partition per ~`bytesPerPart` of local files under `dir`, clamped to
    * [min, max]. The streaming harnesses size their cloned session's
    * shuffle partitions (== state-store count for stateful queries) with
    * this — fixed-4 was measured superlinear at the 100× replay fixture
    * (each store/partition carries the whole scaled increment), while
    * oversizing pays per-store open/commit on every micro-batch. A
    * cluster deployment raises the clamp with the executor count.
    */
  def adaptivePartsForDir(dir: String, bytesPerPart: Long = 16L << 20,
      min: Int = 4, max: Int = 32): Int = {
    val p = java.nio.file.Paths.get(dir)
    val bytes =
      if (java.nio.file.Files.isDirectory(p))
        scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
          st.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
        }
      else if (java.nio.file.Files.isRegularFile(p)) java.nio.file.Files.size(p)
      else 0L
    math.max(min, math.min(max, (bytes / bytesPerPart).toInt))
  }

  /** Best-effort recursive delete of a local scratch directory. */
  def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
        st.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }

  /** True iff `dir` exists and contains any non-hidden entry (a data
    * file or a partition directory). A zero-row Spark write creates a
    * directory holding only `_SUCCESS`; reading that as parquet throws
    * at plan time, so presence checks must mean presence of DATA.
    */
  def hasParquetData(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(dir) && fs.listStatus(dir).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
}
