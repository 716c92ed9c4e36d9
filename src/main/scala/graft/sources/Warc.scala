package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500) container ingest — the at-rest format real crawl
  * corpora arrive in (Common Crawl ships `.warc.gz`, one gzip member per
  * record). The crawl-layer operators (q175/q177/q178) start from an
  * `html` column; this source produces that column from raw container
  * bytes, making the crawl pipeline end-to-end from storage.
  *
  * 100 TB shape: one file = one task via `binaryFiles` (gzip forces a
  * sequential walk per file — the member boundaries ARE the record
  * boundaries, so there is no intra-file parallelism to be had; the
  * fleet parallelism is across the corpus's thousands of part files,
  * the standard CC processing layout). The record walk is a straight
  * byte scan (the WavHeader byte-walk style,
  * expressions/BinaryKernels.scala), `mapPartitions`-family code for the
  * same reason the codec family is: no Catalyst expression consumes a
  * whole file stream.
  *
  * Robustness contract (the forged-WAV guard, container-grade): a record
  * whose Content-Length overruns the file, whose header block is
  * malformed, or whose magic is wrong surfaces as a row with
  * `ok = false` (headers kept when parseable) — and the walk RESYNCS to
  * the next `WARC/1.0\r\n` magic so one corrupt record never silently
  * swallows the rest of the file. Reference anchor for the byte-offset
  * walk: `src/structs/variants/string.rs:106-115`.
  */
object Warc {

  private val Magic = "WARC/1.0\r\n".getBytes(UTF_8)

  private[graft] def httpPayload(html: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n" + html)
      .getBytes(UTF_8)

  /** One WARC response record. `forgeDelta` (test/guard hook) offsets the
    * declared Content-Length from the true payload size — a forged or
    * truncated record for the corruption batteries.
    */
  private[graft] def responseRecord(url: String, html: String,
      forgeDelta: Int = 0): Array[Byte] = {
    val p = httpPayload(html)
    val head = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${p.length + forgeDelta}\r\n\r\n").getBytes(UTF_8)
    head ++ p ++ "\r\n\r\n".getBytes(UTF_8)
  }

  /** The per-file leading warcinfo record (real crawl files carry one). */
  private[graft] def warcinfoRecord(): Array[Byte] = {
    val p = "software: graft\r\nformat: WARC File Format 1.0\r\n".getBytes(UTF_8)
    val head = ("WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${p.length}\r\n\r\n").getBytes(UTF_8)
    head ++ p ++ "\r\n\r\n".getBytes(UTF_8)
  }

  /** Distributed `.warc.gz` sink for (url, html) rows: one file per
    * partition, each record its own gzip member (the standard crawl
    * layout — GZIPOutputStream.finish() closes a member without closing
    * the stream, and multi-member streams decompress transparently on
    * read). Each file leads with a warcinfo record; `forgeTrailer`
    * appends one deliberately length-forged response record
    * (`urn:forged:<partition>`) per file for the corruption gate.
    */
  def writeWarcGz(df: DataFrame, urlCol: String, htmlCol: String, dir: String,
      forgeTrailer: Boolean = false): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(urlCol).cast("string"), col(htmlCol).cast("string")).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val path = new Path(dir, f"part-$pid%05d.warc.gz")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(path, true)
        try {
          def member(rec: Array[Byte]): Unit = {
            val gz = new java.util.zip.GZIPOutputStream(out, 8192)
            gz.write(rec)
            gz.finish() // member boundary; leaves `out` open
          }
          member(warcinfoRecord())
          it.foreach(r => member(responseRecord(r.getString(0), r.getString(1))))
          if (forgeTrailer) member(responseRecord(s"urn:forged:$pid", "x", forgeDelta = 64))
        } finally out.close()
        Iterator.single(pid)
      }.count() // materialize the write
  }

  private val schema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_idx", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("ok", BooleanType, nullable = false),
    StructField("html", StringType, nullable = true)))

  /** Read a directory of `.warc` / `.warc.gz` files into one row per
    * record: (file, record_idx, warc_type, url, http_status, ok, html).
    * `html` is the HTTP response body for type=response records (other
    * types carry NULL); `ok = false` marks records the guard rejected
    * (forged length, malformed headers, bad magic).
    */
  def readWarc(spark: SparkSession, dir: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(dir + "/*.warc*")
      .flatMap { case (file, stream) =>
        val name = new Path(file).getName
        val raw = stream.toArray()
        val bytes =
          if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
            gunzipAll(raw)
          else raw
        parseRecords(bytes).zipWithIndex.map { case (r, i) =>
          Row(name, i.toLong, r.warcType, r.url, r.status, r.ok, r.html)
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Decompress a (possibly multi-member) gzip stream fully. */
  private def gunzipAll(raw: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw), 8192)
    val out = new ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private final case class Rec(warcType: String, url: String,
      status: java.lang.Integer, ok: Boolean, html: String)

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def startsWith(b: Array[Byte], at: Int, p: Array[Byte]): Boolean =
    at + p.length <= b.length && {
      var j = 0
      while (j < p.length && b(at + j) == p(j)) j += 1
      j == p.length
    }

  /** The record walk: parse records at cursor, resync to the next magic
    * after any malformation. Corrupt records keep whatever headers
    * parsed (type/URI) with ok=false and NULL payload fields.
    */
  private def parseRecords(bytes: Array[Byte]): Seq[Rec] = {
    val sep = "\r\n\r\n".getBytes(UTF_8)
    val out = scala.collection.mutable.ArrayBuffer.empty[Rec]
    var cursor = 0
    var going = bytes.nonEmpty
    def resync(from: Int): Unit = {
      val next = indexOf(bytes, Magic, from)
      if (next < 0) going = false else cursor = next
    }
    while (going && cursor < bytes.length) {
      if (!startsWith(bytes, cursor, Magic)) {
        out += Rec(null, null, null, ok = false, null)
        resync(cursor + 1)
      } else {
        val headEnd = indexOf(bytes, sep, cursor)
        if (headEnd < 0) {
          out += Rec(null, null, null, ok = false, null)
          going = false
        } else {
          val headers = new String(bytes, cursor, headEnd - cursor, UTF_8)
            .split("\r\n").drop(1) // drop the version line
            .flatMap { l =>
              val c = l.indexOf(':')
              if (c <= 0) None
              else Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
            }.toMap
          val wt = headers.get("warc-type").orNull
          val uri = headers.get("warc-target-uri").orNull
          val lenOpt = headers.get("content-length").flatMap(s => s.toLongOption)
          val payloadStart = headEnd + sep.length
          lenOpt match {
            case Some(len) if len >= 0 && payloadStart + len <= bytes.length &&
                // the declared length must land ON the record separator
                // (or exactly at EOF): an in-bounds FORGED length lands
                // mid-next-record instead — without this check it would
                // silently absorb foreign bytes into the payload
                (payloadStart + len == bytes.length ||
                  startsWith(bytes, payloadStart + len.toInt, sep)) =>
              val html =
                if (wt == "response") {
                  val pEnd = payloadStart + len.toInt
                  val bodyAt = indexOf(bytes, sep, payloadStart) match {
                    case b if b >= 0 && b + sep.length <= pEnd => b + sep.length
                    case _ => pEnd // headerless/degenerate HTTP: empty body
                  }
                  new String(bytes, bodyAt, pEnd - bodyAt, UTF_8)
                } else null
              val status =
                if (wt == "response") {
                  val lineEnd = indexOf(bytes, "\r\n".getBytes(UTF_8), payloadStart)
                  val line = new String(bytes, payloadStart,
                    (if (lineEnd < 0) payloadStart else lineEnd) - payloadStart, UTF_8)
                  val toks = line.split(" ")
                  if (toks.length >= 2) toks(1).toIntOption
                    .map(Int.box).orNull
                  else null
                } else null
              out += Rec(wt, uri, status.asInstanceOf[java.lang.Integer],
                ok = true, html)
              cursor = payloadStart + len.toInt
              if (startsWith(bytes, cursor, sep)) cursor += sep.length
              else going = false // EOF landed exactly at payload end
            case _ =>
              // forged/overrunning length or unparseable header: the
              // guard row, then resync past this record's magic
              out += Rec(wt, uri, null, ok = false, null)
              resync(cursor + 1)
          }
        }
      }
    }
    out.toSeq
  }
}
