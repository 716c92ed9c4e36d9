package graft

import graft.streaming.Events
import org.apache.spark.sql.functions._

/** Streaming semantics: the streaming windowed agg must equal its batch
  * twin; stateful sessionization sanity.
  */
class StreamingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming windowed agg equals batch equivalent") {
    val streamed = Events.windowedCountsStreaming(spark, sf, "6 hours")
      .orderBy(col("wstart"), col("event_type")).collect()
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("total_value"))
      .orderBy(col("wstart"), col("event_type")).collect()
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("batch sessionization: session ids monotone, gaps split sessions") {
    val sess = Events.sessionizeBatch(Tables.events(spark, sf), gapMinutes = 30)
    val agg = sess.groupBy(col("user_id"))
      .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .collect()
    agg.foreach { r =>
      assert(r.getLong(1) >= 1L)
      assert(r.getLong(1) <= r.getLong(2)) // sessions <= events
    }
  }

  test("foreachBatch append (SuperTable push/consolidate parity, super_table.rs:138)") {
    // the reference's chunked-append model: each micro-batch appends a
    // chunk; consolidate == union of chunks. Verify the streamed append
    // reconstructs the batch table.
    val raw = spark.readStream
      .schema(Tables.load(spark, sf, "events").schema)  // RAW fixture schema, either form
      .parquet(Events.stageDir(sf))
    val chunks = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    val q = raw.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        chunks += batch.persist()  // SuperTable::push
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val consolidated = chunks.reduce(_ unionByName _)   // Consolidate
    assert(consolidated.count() === Tables.events(spark, sf).count())
    chunks.foreach(_.unpersist())
  }

  test("foreachBatch streams into the arrowdir DSv2 sink; compaction keeps rows") {
    import graft.sources.ArrowInterop
    // stream → per-batch DSv2 append: the streaming leg of the arrowdir
    // WRITE path (q97 covers the read leg). Then the maintenance op:
    // compaction rewrites the accreted small payloads without data loss.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val raw = Tables.normalizeTs(spark.readStream
        .schema(Tables.load(spark, sf, "events").schema)  // RAW fixture schema, either form
        .parquet(Events.stageDir(sf)))
      .withColumn("ts", unix_micros(col("ts")))  // long µs; arrow path is type-agnostic
    val q = raw.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.format("graft.sources.arrowdir").mode("append").save(dir)
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val expectN = Tables.events(spark, sf).count()
    val back = spark.read.format("graft.sources.arrowdir").load(dir)
    assert(back.count() === expectN)
    // compact and re-read through BOTH readers
    val n = ArrowInterop.compactBatchDir(spark, dir, targetBytes = 1L << 30)
    assert(n >= 1)
    assert(spark.read.format("graft.sources.arrowdir").load(dir).count() === expectN)
    val sum1 = ArrowInterop.readBatchDir(spark, dir).agg(sum(col("event_id"))).head().getLong(0)
    val sum2 = Tables.events(spark, sf).agg(sum(col("event_id"))).head().getLong(0)
    assert(sum1 === sum2)
  }

  test("native session_window streaming mode matches the batch oracle on closed sessions") {
    val gapUs = 30L * 60 * 1000000
    val streamed = Events.sessionizeStreamingNative(spark, sf, gapMinutes = 30)
    // session_window end = last event + gap; normalize to last-event time
    // to compare against the batch session table
    val emitted = streamed.select(col("user_id"), col("sess_start_us"),
        (col("sess_end_us") - lit(gapUs)).as("e"), col("n_events"))
      .collect().map(_.toSeq).toSet
    val batchSess = Events.sessionizeBatch(Tables.events(spark, sf), 30)
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(unix_micros(col("ts"))).as("s"), max(unix_micros(col("ts"))).as("e"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("s"), col("e"), col("n"))
      .collect().map(_.toSeq).toSet
    assert(emitted.nonEmpty, "no sessions emitted — watermark never closed any window")
    assert(emitted.subsetOf(batchSess),
      s"streamed sessions disagree with batch: ${(emitted -- batchSess).take(3)}")
  }

  test("stateful streaming sessionization emits closed sessions consistent with batch") {
    val streamed = Events.sessionizeStreaming(spark, sf, gapMinutes = 30)
    // single-batch replay: only sessions closed by a later intra-batch gap
    // are emitted; each emitted session must exist in the batch result.
    val batchSess = Events.sessionizeBatch(Tables.events(spark, sf), 30)
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(unix_micros(col("ts"))).as("s"), max(unix_micros(col("ts"))).as("e"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("s"), col("e"), col("n"))
      .collect().map(_.toSeq).toSet
    val emitted = streamed.collect().map(_.toSeq).toSet
    assert(emitted.subsetOf(batchSess))
    assert(emitted.nonEmpty)
  }

  test("transformWithState sessionization emits the same closed sessions as flatMapGroupsWithState") {
    val tws = Events.sessionizeTransformWithState(spark, sf, gapMinutes = 30)
      .collect().map(_.toSeq).toSet
    val fmgws = Events.sessionizeStreaming(spark, sf, gapMinutes = 30)
      .collect().map(_.toSeq).toSet
    assert(tws === fmgws, "the two arbitrary-state APIs disagree on closed sessions")
    assert(tws.nonEmpty)
  }

  test("arrowdir micro-batch stream tails DSv2 appends incrementally") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_arrowdir_stream_").toString
    val fmt = "graft.sources.arrowdir"
    val nation = Tables.nation(spark, sf)
    val firstHalf = nation.filter(col("n_nationkey") < 12)
    val secondHalf = nation.filter(col("n_nationkey") >= 12)
    firstHalf.write.format(fmt).mode("append").save(dir)

    val name = "arrowdir_stream_sink"
    val stream = spark.readStream.format(fmt)
      .schema(graft.sources.arrowdir.ArrowDirSource.sidecarSchema(dir))
      .load(dir)
      .select(col("n_nationkey"), col("n_name"))
    val q = stream.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      val afterFirst = spark.table(name).count()
      assert(afterFirst === firstHalf.count(), s"first micro-batch read $afterFirst rows")
      // append more payloads while the stream is up — only the delta may arrive
      secondHalf.write.format(fmt).mode("append").save(dir)
      q.processAllAvailable()
      val all = spark.table(name).select(col("n_nationkey"))
        .collect().map(_.get(0).toString.toLong).sorted.toSeq
      assert(all === nation.select(col("n_nationkey"))
        .collect().map(_.get(0).toString.toLong).sorted.toSeq,
        "streamed union of both appends must equal the full table, exactly once each")
    } finally q.stop()
    // offset round-trip: serialized form is stable and recovers the set
    val off = graft.sources.arrowdir.ArrowDirOffset(Set("b.arrowbatch", "a.arrowbatch"))
    assert(graft.sources.arrowdir.ArrowDirOffset.fromJson(off.json()) === off)
    assert(off.json() === """["a.arrowbatch","b.arrowbatch"]""")
    // a payload vanishing between offsets (external truncate under a live
    // stream) must fail the batch loudly, not silently re-deliver
    val mbs = graft.sources.arrowdir.ArrowDirMicroBatchStream(
      dir, stream.schema, stream.schema, "UTC", largeVarTypes = false, None)
    val ex = intercept[IllegalArgumentException] {
      mbs.planInputPartitions(
        graft.sources.arrowdir.ArrowDirOffset(Set("gone.arrowbatch")),
        graft.sources.arrowdir.ArrowDirOffset(Set.empty))
    }
    assert(ex.getMessage.contains("vanished"))
  }
}
