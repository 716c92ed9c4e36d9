package graft

import graft.sources.TextSources
import org.apache.spark.sql.functions._

/** CSV / JSON-lines round-trips with explicit schemas (§2.10). */
class TextSourcesSpec extends SparkSpec {

  private def ordersSample = Tables.orders(spark, "/root/testdata/sf0.001").limit(200)

  test("CSV round-trip preserves values incl. timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val src = ordersSample
    TextSources.writeCsv(src, dir)
    val back = TextSources.readCsv(spark, dir, src.schema)
    val a = src.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    val b = back.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("NTZ timestamps with non-zero microseconds survive CSV and JSON round-trips") {
    // timestampFormat does NOT apply to TIMESTAMP_NTZ columns (separate
    // timestampNTZFormat option) — without it, sub-second precision is
    // silently truncated to the default millis pattern
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("t", TimestampNTZType)))
    val src = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, java.time.LocalDateTime.parse("2024-03-01T12:34:56.123456")),
        org.apache.spark.sql.Row(2L, java.time.LocalDateTime.parse("2024-03-01T00:00:00.000001"))),
      schema)
    for ((write, read) <- Seq[((org.apache.spark.sql.DataFrame, String) => Unit,
        (org.apache.spark.sql.SparkSession, String, StructType) => org.apache.spark.sql.DataFrame)](
      (TextSources.writeCsv _, TextSources.readCsv _),
      (TextSources.writeJsonLines _, TextSources.readJsonLines _))) {
      val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
      write(src, dir)
      val back = read(spark, dir, schema)
      assert(back.orderBy(col("id")).collect().map(_.toSeq).toSeq ===
        src.orderBy(col("id")).collect().map(_.toSeq).toSeq)
    }
  }

  test("JSON-lines round-trip preserves values incl. timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val src = ordersSample
    TextSources.writeJsonLines(src, dir)
    val back = TextSources.readJsonLines(spark, dir, src.schema)
    val a = src.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    val b = back.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("quarantine read routes malformed lines without failing or dropping") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_quarantine").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "data.jsonl"),
      """{"id": 1, "v": 10.5}
        |{"id": 2, "v": "not-a-number"}
        |this is not json at all
        |{"id": 4, "v": 2.25}
        |{"id": 5 BROKEN
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val (good, bad) = TextSources.readJsonLinesQuarantine(spark, dir, schema)
    val g = good.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(g === Seq((1L, 10.5), (4L, 2.25)))
    val q = bad.collect().map(_.getString(0)).toSeq
    assert(q.length === 3, s"expected 3 quarantined lines, got: $q")
    assert(q.exists(_.contains("not-a-number")) && q.exists(_.contains("not json")) &&
      q.exists(_.contains("BROKEN")))
  }

  test("WARC round trip: multi-member gz, warcinfo lead, payload recovery, HTTP split") {
    import graft.sources.Warc
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_rt").toString
    val pages = Seq(
      (0L, "http://a.example/one", "<html><body>alpha &amp; beta</body></html>"),
      (1L, "http://b.example/two", "<html><body>second page</body></html>"),
      (2L, "http://c.example/three", "")) // empty body is a legal record
      .toDF("id", "url", "html").orderBy("id").coalesce(1)
    Warc.writeWarcGz(pages, "url", "html", dir)
    val got = Warc.readWarc(spark, dir).orderBy(col("record_idx")).collect()
    assert(got.length === 4)
    assert(got(0).getString(2) === "warcinfo" && got(0).getBoolean(5))
    assert(got(0).isNullAt(3) && got(0).isNullAt(6)) // no URI, no response body
    Seq((1, "http://a.example/one", "<html><body>alpha &amp; beta</body></html>"),
        (2, "http://b.example/two", "<html><body>second page</body></html>"),
        (3, "http://c.example/three", "")).foreach { case (i, url, html) =>
      assert(got(i).getString(2) === "response")
      assert(got(i).getString(3) === url)
      assert(got(i).getInt(4) === 200)
      assert(got(i).getBoolean(5), s"record $i not ok")
      assert(got(i).getString(6) === html, s"record $i payload drifted")
    }
    graft.ops.Layout.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("WARC guard battery: forged length, truncated tail, garbage preamble all resync") {
    import graft.sources.Warc
    import java.nio.charset.StandardCharsets.UTF_8
    def parse(bytes: Array[Byte]): Array[org.apache.spark.sql.Row] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_warc_g")
      java.nio.file.Files.write(dir.resolve("x.warc"), bytes)
      val rows = Warc.readWarc(spark, dir.toString).orderBy(col("record_idx")).collect()
      graft.ops.Layout.deleteRecursively(dir)
      rows
    }
    val good = Warc.responseRecord("http://ok.example/", "<p>fine</p>")
    // 1. FORGED length mid-file: the corrupt record surfaces ok=false with
    //    its parsed headers, and the walk resyncs — the following record
    //    still parses (one bad record never swallows the file)
    val forged = Warc.responseRecord("http://bad.example/", "<p>x</p>", forgeDelta = 7)
    val r1 = parse(forged ++ good)
    assert(r1.length === 2)
    assert(!r1(0).getBoolean(5) && r1(0).getString(3) === "http://bad.example/")
    assert(r1(0).isNullAt(4) && r1(0).isNullAt(6)) // no status, no payload
    assert(r1(1).getBoolean(5) && r1(1).getString(3) === "http://ok.example/")
    // 2. TRUNCATED tail (declared length overruns EOF): guard row, stop
    val r2 = parse(good ++ Warc.responseRecord("http://cut.example/", "tail").dropRight(20))
    assert(r2.length === 2)
    assert(r2(0).getBoolean(5))
    assert(!r2(1).getBoolean(5) && r2(1).getString(3) === "http://cut.example/")
    // 3. GARBAGE preamble (bad magic): one unknown guard row, then resync
    //    onto the real record
    val r3 = parse("NOT A WARC FILE AT ALL\r\n".getBytes(UTF_8) ++ good)
    assert(r3.length === 2)
    assert(!r3(0).getBoolean(5) && r3(0).isNullAt(2) && r3(0).isNullAt(3))
    assert(r3(1).getBoolean(5) && r3(1).getString(3) === "http://ok.example/")
    // 4. Content-Length missing entirely: guard row with parsed type/URI
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://nolen.example/\r\n\r\nHTTP/1.1 200 OK\r\n\r\nbody")
      .getBytes(UTF_8)
    val r4 = parse(noLen ++ "\r\n\r\n".getBytes(UTF_8) ++ good)
    assert(r4.length === 2)
    assert(!r4(0).getBoolean(5) && r4(0).getString(3) === "http://nolen.example/")
    assert(r4(1).getBoolean(5))
  }

  test("WARC walk is incrementally buffered: peak window tracks the largest record, not the file") {
    import graft.sources.Warc
    // 400 records × ~32 KiB ≈ 13 MiB of container bytes. A whole-file
    // materialization would need ≥ 13 MiB; the streaming walk's window
    // must stay near the LARGEST single record (64 KiB floor, ×2 growth).
    val body = "x" * (32 * 1024)
    val one = Warc.responseRecord("http://big.example/", body)
    val all = Array.fill(400)(one).flatten[Byte]
    assert(all.length > 12 * 1024 * 1024)
    val rows = Warc.parseRecordRows(new java.io.ByteArrayInputStream(all)).toVector
    assert(rows.length === 400 && rows.forall(_._4), "all records must parse ok")
    assert(rows.forall(_._5 == body), "payloads must survive the windowed walk")
    val peak = Warc.lastPeakWindow.get()
    assert(peak != null && peak <= 4 * one.length + 64 * 1024,
      s"window grew past one-record scale: peak=$peak bytes for a ${one.length}-byte record")
    assert(peak < all.length / 10,
      s"window scales with the file, not the record: peak=$peak of ${all.length}")
  }

  test("WARC walk is lazy: rows stream out without exhausting the container first") {
    import graft.sources.Warc
    // An input stream that fails PAST the first two records: take(2) must
    // succeed without ever reading that far — proof rows are emitted
    // incrementally, not parsed-then-returned.
    val good = Warc.responseRecord("http://lazy.example/", "<p>ok</p>")
    val prefix = good ++ good
    val in = new java.io.InputStream {
      private var at = 0
      override def read(): Int =
        if (at < prefix.length) { val b = prefix(at) & 0xff; at += 1; b }
        else throw new java.io.IOException("read past the lazy horizon")
      override def read(b: Array[Byte], off: Int, n: Int): Int = {
        if (at >= prefix.length) throw new java.io.IOException("read past the lazy horizon")
        val m = math.min(n, prefix.length - at)
        System.arraycopy(prefix, at, b, off, m); at += m; m
      }
    }
    val first2 = Warc.parseRecordRows(in).take(2).toVector
    assert(first2.length === 2 && first2.forall(_._4))
    assert(first2.forall(_._5 == "<p>ok</p>"))
  }

  test("WARC unbounded header block: capped, guarded, resyncs onto the next record") {
    import graft.sources.Warc
    import java.nio.charset.StandardCharsets.UTF_8
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_cap")
    val good = Warc.responseRecord("http://after.example/", "<p>after</p>")
    // a magic followed by >1 MiB with no \r\n\r\n: the walk must not
    // buffer it without bound — guard row, then resync onto `good`
    val junk = ("WARC/1.0\r\nWARC-Type: junkheader\r\n" + "y" * (2 * 1024 * 1024)).getBytes(UTF_8)
    java.nio.file.Files.write(dir.resolve("x.warc"), junk ++ good)
    val rows = Warc.readWarc(spark, dir.toString).orderBy(col("record_idx")).collect()
    graft.ops.Layout.deleteRecursively(dir)
    assert(rows.length === 2, s"expected guard + good, got ${rows.length}")
    assert(!rows(0).getBoolean(5))
    assert(rows(1).getBoolean(5) && rows(1).getString(3) === "http://after.example/")
  }

  test("WARC forged multi-GiB Content-Length: rejected BEFORE buffering, window stays record-sized") {
    import graft.sources.Warc
    import java.nio.charset.StandardCharsets.UTF_8
    // Declared lengths far past MaxRecordBytes (including one that would
    // overflow payloadStart + len as an Int): each must produce a guard
    // row WITHOUT the window growing toward the declared size — the
    // pre-cap walk would buffer the entire rest of the stream (and
    // NegativeArraySizeException past 1 GiB of doubling) before the
    // lands-on-separator guard could reject.
    val good = Warc.responseRecord("http://after.example/", "<p>after</p>")
    for (forgedLen <- Seq(Warc.MaxRecordBytes.toLong + 1, 3L * 1024 * 1024 * 1024,
        Int.MaxValue.toLong + 5000)) {
      val bad = ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: http://huge.example/\r\n" +
        s"Content-Length: $forgedLen\r\n\r\nHTTP/1.1 200 OK\r\n\r\ntiny")
        .getBytes(UTF_8) ++ "\r\n\r\n".getBytes(UTF_8)
      val rows = Warc.parseRecordRows(
        new java.io.ByteArrayInputStream(bad ++ good)).toVector
      assert(rows.length === 2, s"len=$forgedLen: expected guard + good, got $rows")
      assert(!rows(0)._4 && rows(0)._2 === "http://huge.example/")
      assert(rows(1)._4 && rows(1)._2 === "http://after.example/")
      val peak = Warc.lastPeakWindow.get()
      assert(peak != null && peak <= 1024 * 1024,
        s"len=$forgedLen buffered toward the forged size: peak=$peak")
    }
  }

  test("WARC early-terminated read (limit) completes and releases the task cleanly") {
    import graft.sources.Warc
    import spark.implicits._
    // limit() stops the per-file iterator before exhaustion; the task-
    // completion listener (not iterator exhaustion) closes the handle —
    // this pins the path executes without error under a real task
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_lim").toString
    val pages = (0 until 50).map(i => (i.toLong, s"http://p$i.example/", s"<p>page $i</p>"))
      .toDF("id", "url", "html").coalesce(1)
    Warc.writeWarcGz(pages, "url", "html", dir)
    val first = Warc.readWarc(spark, dir).filter(col("warc_type") === "response")
      .limit(3).collect()
    assert(first.length === 3 && first.forall(_.getBoolean(5)))
    graft.ops.Layout.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
