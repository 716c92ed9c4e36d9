package graft.ops

import org.apache.spark.sql.DataFrame

/** Bounded registry for operator-internal persists.
  *
  * Operators like RowIndex.withRowIndex and Dedup.minHashLshPairs persist an
  * intermediate so a bounded metadata pass and the caller's action share one
  * computation. The caller can't bracket the lifetime (it holds a lazy
  * DataFrame), so left alone each call would pin a cached relation until
  * spark.stop() — and disk-tier blocks are NOT LRU-evicted, only the memory
  * tier is. This registry keeps the N most recent operator caches and
  * unpersists evictees; recompute after eviction is correct (the plans are
  * deterministic), just slower.
  */
object CacheRegistry {
  private val maxEntries = 8
  private val entries = new java.util.ArrayDeque[DataFrame]()
  private val rddEntries = new java.util.ArrayDeque[org.apache.spark.rdd.RDD[_]]()

  def register(df: DataFrame): DataFrame = synchronized {
    entries.addLast(df)
    while (entries.size() > maxEntries) {
      try entries.removeFirst().unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
    df
  }

  /** Same policy for operator-internal RDD persists (the CC label table). */
  def registerRdd[T](rdd: org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] =
    synchronized {
      rddEntries.addLast(rdd)
      while (rddEntries.size() > maxEntries) {
        try rddEntries.removeFirst().unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
      rdd
    }

  /** Release everything now (e.g. between bench passes). */
  def releaseAll(): Unit = synchronized {
    while (!entries.isEmpty) {
      try entries.removeFirst().unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
    while (!rddEntries.isEmpty) {
      try rddEntries.removeFirst().unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
  }
}
