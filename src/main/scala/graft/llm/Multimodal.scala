package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media payloads
  * as opaque `binary` columns with a typed metadata struct, plus the
  * decode / feature-extract plumbing shaped the way a real pipeline runs it
  * (per-partition batch processing over binary columns).
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic fake (`fakeDecode`) —
  * the Spark-side plumbing (schema, partitioning, per-partition batching,
  * output shape) is real and tested. Swap `fakeDecode` for a JNI/process
  * call (or `mapInArrow` to a Python worker) in production.
  */
object Multimodal {

  /** Metadata schema carried next to every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", mediaMetaSchema, nullable = false)))

  /** Build a media table from any (id, binary) source: attaches metadata
    * derived from the payload. Pure column ops.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(format).as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        length(col(payloadCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** Audio metadata: sample rate instead of image dimensions. */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Audio table from any (id, binary) source: payload treated as 16-bit
    * mono PCM at `sampleRate` (the fixture has no real codecs — same
    * honest-stub stance as `fakeDecode`; the framing arithmetic below is
    * the real part).
    */
  def asAudioTable(df: DataFrame, idCol: String, payloadCol: String,
      sampleRate: Int): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit("pcm16").as("format"),
        lit(sampleRate).as("sample_rate"),
        length(col(payloadCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** Frame sampling over PCM audio: fixed `frameMs` windows advancing by
    * `hopMs` (hop < frame ⇒ overlap, the STFT shape). Pure codegen
    * arithmetic + binary `substr` — the time-axis sibling of
    * [[Chunking.chunkByTokens]]; clips shorter than one frame emit
    * nothing (standard frontend behavior). Output: media_id, frame_id,
    * start_ms, frame (binary).
    */
  def frameSlices(audio: DataFrame, frameMs: Int, hopMs: Int): DataFrame = {
    require(frameMs > 0 && hopMs > 0, s"frameMs/hopMs must be positive: $frameMs/$hopMs")
    // 16-bit mono: bytes = samples × 2; all products are exact in double
    // (≪ 2^53) and the ms arithmetic divides evenly by construction
    val frameBytes = (col("meta.sample_rate") * (2 * frameMs) / 1000).cast("int")
    val hopBytes = (col("meta.sample_rate") * (2 * hopMs) / 1000).cast("int")
    val nb = col("meta.n_bytes").cast("int")
    val starts = when(nb >= frameBytes,
      sequence(lit(0), nb - frameBytes, hopBytes)).otherwise(array())
    audio
      .select(col("media_id"), col("payload"), frameBytes.as("__fb"),
        col("meta.sample_rate").as("__sr"),
        posexplode(starts).as(Seq("frame_id", "__start")))
      .select(
        col("media_id"),
        col("frame_id").cast("long").as("frame_id"),
        // start bytes → ms: bytes/ms = sample_rate·2/1000; the division is
        // exact (starts are hop multiples, hop divides evenly into ms)
        (col("__start") * lit(1000L) / (col("__sr") * 2L)).cast("long").as("start_ms"),
        col("payload").substr(col("__start") + 1, col("__fb")).as("frame"))
  }

  /** Video table from any (id, binary) source: payload treated as raw
    * frame-major video (`frameBytes` per frame at `fps` — the rawvideo
    * layout) with a typed meta struct. Same honest-stub stance as
    * [[asAudioTable]]: no codecs in the sandbox, so the payload stands in
    * for decoded frames; the indexing/sampling arithmetic is the real
    * part a cluster pipeline needs.
    */
  def asVideoTable(df: DataFrame, idCol: String, payloadCol: String,
      fps: Int, frameBytes: Int): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit("rawvideo").as("format"),
        lit(fps).as("fps"),
        lit(frameBytes).as("frame_bytes"),
        length(col(payloadCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** Uniform temporal frame sampling — the "sample k frames per clip"
    * prep every video training pipeline runs. Complete frames n =
    * ⌊bytes / frame_bytes⌋; sampled indices idx_j = ⌊j·n/k⌋ (j < min(k,
    * n)) — evenly spaced, always including frame 0, never past the end;
    * clips shorter than one frame emit nothing. Pure codegen arithmetic
    * + binary substr, shuffle-free. Output: media_id, sample_id,
    * frame_idx, t_ms, frame (binary).
    */
  def sampleFrames(video: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val fb = col("meta.frame_bytes")
    // exact integer division throughout (floorDivI is IntegralDivide for
    // the non-negative operands here) — a double route would wobble past
    // 2^53 on long clips
    val n = graft.ops.Arith.floorDivI(col("meta.n_bytes"), fb)
    val m = least(lit(k.toLong), n)
    val idxs = when(n > 0, transform(sequence(lit(0L), m - 1),
      j => graft.ops.Arith.floorDivI(j * n, m))).otherwise(array())
    video
      .select(col("media_id"), col("payload"), fb.as("__fb"),
        col("meta.fps").as("__fps"),
        posexplode(idxs).as(Seq("sample_id", "frame_idx")))
      .select(
        col("media_id"),
        col("sample_id").cast("long").as("sample_id"),
        col("frame_idx"),
        // frame_idx/fps seconds → ms, exact integer arithmetic
        graft.ops.Arith.floorDivI(col("frame_idx") * 1000L, col("__fps")).as("t_ms"),
        col("payload").substr((col("frame_idx") * col("__fb")).cast("int") + 1,
          col("__fb").cast("int")).as("frame"))
  }

  /** STUB — deterministic fake "decode + feature-extract" of a media
    * payload: 8 float features from byte statistics. A real deployment
    * replaces this body with the codec call; signature and batch shape stay.
    */
  def fakeDecode(payload: Array[Byte]): Array[Float] = {
    var sum = 0L; var min = 255; var max = 0
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b; if (b < min) min = b; if (b > max) max = b
      i += 1
    }
    val n = math.max(payload.length, 1)
    Array(
      payload.length.toFloat, (sum.toDouble / n).toFloat,
      min.toFloat, max.toFloat,
      (sum % 251).toFloat, (payload.headOption.map(_ & 0xff).getOrElse(0)).toFloat,
      (payload.lastOption.map(_ & 0xff).getOrElse(0)).toFloat,
      ((sum * 2654435761L) % 1009).toFloat)
  }

  /** Feature extraction over the media table: per-partition batch loop (the
    * shape a real decoder wants — amortized codec init per partition, rows
    * streamed through). Output: (media_id, features array<float>, n_bytes).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("n_bytes", LongType, nullable = false)))
    val rdd = media.select(col("media_id"), col("payload")).rdd.mapPartitions { rows =>
      // per-partition init happens here in a real codec (decoder handle etc.)
      rows.map { r =>
        val id = r.getLong(0)
        // guard: the schema declares payload non-null but an upstream cast
        // can still produce one — treat as empty media, don't NPE the task
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        Row(id, fakeDecode(payload).toSeq, payload.length.toLong)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB — deterministic fake "resize": stride-decimate the payload bytes
    * to a target size budget (a real deployment decodes, resamples pixels,
    * re-encodes). Signature, per-partition batch shape and the metadata
    * contract (width/height stamped on the output) are the real pipeline's.
    */
  def fakeResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, math.min(payload.length, w * h))
    val stride = math.max(1, payload.length / target)
    val out = new Array[Byte](math.min(target, (payload.length + stride - 1) / stride))
    var i = 0
    while (i < out.length) { out(i) = payload(i * stride); i += 1 }
    out
  }

  /** Resize over the media table: per-partition batch loop like
    * `extractFeatures`; output rows keep media_id and carry the resized
    * payload with width/height stamped in meta.
    */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    val rdd = media.select(col("media_id"), col("payload"), col("meta.format")).rdd
      .mapPartitions { rows =>
        // per-partition init point for a real codec
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          val resized = fakeResize(payload, w, h)
          Row(r.getLong(0), resized, Row(r.getString(2), w, h, resized.length.toLong))
        }
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Frame/patch sampling stub: emits `n` deterministic byte-slices per
    * payload (what frame-sampling does to video), as its own rows —
    * explode keeps it fully distributed.
    */
  def samplePatches(media: DataFrame, n: Int, patchBytes: Int): DataFrame =
    media.select(col("media_id"), col("meta"),
      posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => substring(col("payload"), (i * patchBytes + 1).cast("int"), lit(patchBytes)))))
      .withColumnRenamed("pos", "patch_idx")
      .withColumnRenamed("col", "patch")
      .filter(length(col("patch")) > 0)
}
