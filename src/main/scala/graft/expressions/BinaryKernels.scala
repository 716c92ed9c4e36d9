package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Sum of UNSIGNED byte values of a binary payload — the checksum/mass
  * statistic for raw media planes (gray8 pixel buffers, PCM frames),
  * where no builtin exists (Spark has no HOFs over BinaryType). One tight
  * loop, whole-stage-codegen'd.
  */
case class ByteSum(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_sum"
  override protected def nullSafeEval(v: Any): Any =
    ByteSum.sum(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.ByteSum.sum($v)")
  override protected def withNewChildInternal(c: Expression): ByteSum = copy(child = c)
}

object ByteSum {
  def sum(b: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < b.length) { s += (b(i) & 0xff); i += 1 }
    s
  }
}

/** Parse a WAV/RIFF container header from raw bytes: walks the chunk list
  * (word-aligned per the RIFF spec), reads the `fmt ` chunk's PCM
  * parameters and the `data` chunk's extent, and returns
  * struct(sample_rate, channels, bits, data_off, data_len) — or NULL for
  * anything that is not a well-formed integer-PCM WAV (missing magic,
  * truncated chunks, compressed audioFormat ≠ 1). Pure byte arithmetic,
  * whole-stage-codegen'd: the real-container complement of the raw-PCM16
  * metadata contract (`Multimodal.asAudioTable`), doing for audio what
  * javax.imageio did for images. The extracted data extent is CLAMPED to
  * the payload (a header promising more bytes than exist yields the bytes
  * that do) so downstream framing can never slice past the buffer.
  */
case class WavHeader(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = WavHeader.schema
  override def nullable: Boolean = true
  override def prettyName: String = "wav_header"
  override protected def nullSafeEval(v: Any): Any =
    WavHeader.parse(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("wavHdr")
      s"""org.apache.spark.sql.catalyst.InternalRow $r = graft.expressions.WavHeader.parse($v);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): WavHeader = copy(child = c)
}

object WavHeader {
  val schema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("data_off", IntegerType, nullable = false),
    StructField("data_len", LongType, nullable = false)))

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int, t: String): Boolean =
    b(o) == t.charAt(0).toByte && b(o + 1) == t.charAt(1).toByte &&
      b(o + 2) == t.charAt(2).toByte && b(o + 3) == t.charAt(3).toByte

  /** NULL for non-WAV; else (sample_rate, channels, bits, data_off, data_len). */
  def parse(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    if (b == null || b.length < 44) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var off = 12
    var rate = -1
    var channels = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1L
    while (off + 8 <= b.length && (rate < 0 || dataOff < 0)) {
      val size = u32(b, off + 4)
      if (tag(b, off, "fmt ") && size >= 16 && off + 8 + 16 <= b.length) {
        if (u16(b, off + 8) != 1) return null // integer PCM only
        channels = u16(b, off + 10)
        rate = u32(b, off + 12).toInt
        bits = u16(b, off + 22)
      } else if (tag(b, off, "data")) {
        dataOff = off + 8
        dataLen = math.min(size, (b.length - dataOff).toLong)
      }
      // chunks are word-aligned (odd sizes carry one pad byte); the
      // advance is computed in Long so a forged 4 GiB chunk size can't
      // wrap the offset into an infinite loop
      val next = off.toLong + 8L + size + (size & 1L)
      off = if (next > b.length.toLong) b.length else next.toInt
    }
    if (rate <= 0 || channels <= 0 || bits <= 0 || dataOff < 0) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](rate, channels, bits, dataOff, dataLen))
  }
}

/** s16le PCM sample values of a binary payload as array<int> (ragged
  * trailing byte dropped) — the debug/oracle surface of the PCM family:
  * integer samples compare cell-exactly in SQL where byte strings can't.
  */
case class PcmSamples(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pcm_samples"
  override protected def nullSafeEval(v: Any): Any =
    PcmKernels.samples(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.PcmKernels.samples($v)")
  override protected def withNewChildInternal(c: Expression): PcmSamples = copy(child = c)
}

/** Interleaved N-channel s16le PCM → mono by per-group channel average
  * (floor division — engine-portable via FLOOR(sum/n) on the oracle
  * side). `channels` rides as an expression so the PARSED WAV header
  * drives it ([[WavHeader]]'s channels field). Ragged trailing bytes and
  * partial sample groups drop; channels ≤ 0 yields an empty payload
  * (total function — no codegen null path).
  */
case class PcmMonoMix(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with Serializable {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pcm_mono_mix"
  override protected def nullSafeEval(data: Any, ch: Any): Any =
    PcmKernels.monoMix(data.asInstanceOf[Array[Byte]], ch.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (d, c) => s"graft.expressions.PcmKernels.monoMix($d, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PcmMonoMix =
    copy(left = l, right = r)
}

/** Integer sample-rate conversion of mono s16le PCM: output sample n maps
  * to input position n·src/dst in exact long arithmetic — nearest
  * (`linear = false`) takes the floor index; linear interpolates
  * `floor((a·(dst−frac) + b·frac)/dst)` with the final sample clamped.
  * The source rate rides as an expression (the parsed WAV header);
  * non-positive rates yield an empty payload. Equal rates pass through
  * (ragged byte still trimmed).
  */
case class PcmResample(left: Expression, right: Expression,
    dstRate: Int, linear: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with Serializable {
  require(dstRate > 0, s"target rate must be positive: $dstRate")
  override def dataType: DataType = BinaryType
  override def prettyName: String = if (linear) "pcm_resample_linear" else "pcm_resample_nearest"
  override protected def nullSafeEval(data: Any, sr: Any): Any =
    PcmKernels.resample(data.asInstanceOf[Array[Byte]], sr.asInstanceOf[Int],
      dstRate, linear)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (d, r) => s"graft.expressions.PcmKernels.resample($d, $r, $dstRate, $linear)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PcmResample =
    copy(left = l, right = r)
}

object PcmKernels {
  private def s16(b: Array[Byte], i: Int): Int = (b(2 * i) & 0xff) | (b(2 * i + 1) << 8)
  private def w16(out: Array[Byte], i: Int, v: Int): Unit = {
    out(2 * i) = (v & 0xff).toByte
    out(2 * i + 1) = ((v >> 8) & 0xff).toByte
  }

  /** s16le samples as boxed ints (ragged trailing byte dropped). */
  def samples(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = b.length / 2
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = s16(b, i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Channel-average mono mix (floor division; total function). */
  def monoMix(b: Array[Byte], channels: Int): Array[Byte] = {
    if (channels <= 0) return Array.emptyByteArray
    val groups = (b.length / 2) / channels
    val out = new Array[Byte](groups * 2)
    var g = 0
    while (g < groups) {
      var sum = 0L
      var c = 0
      while (c < channels) { sum += s16(b, g * channels + c); c += 1 }
      w16(out, g, Math.floorDiv(sum, channels).toInt)
      g += 1
    }
    out
  }

  /** Integer nearest/linear rate conversion of mono s16le (total). */
  def resample(b: Array[Byte], srcRate: Int, dstRate: Int,
      linear: Boolean): Array[Byte] = {
    if (srcRate <= 0 || dstRate <= 0) return Array.emptyByteArray
    val nIn = b.length / 2
    val nOut = (nIn.toLong * dstRate / srcRate).toInt
    val out = new Array[Byte](nOut * 2)
    var n = 0
    while (n < nOut) {
      val pos = n.toLong * srcRate
      val i = (pos / dstRate).toInt
      val v =
        if (!linear) s16(b, i)
        else {
          val frac = pos - i.toLong * dstRate
          val a = s16(b, i)
          val c = s16(b, math.min(i + 1, nIn - 1))
          Math.floorDiv(a * (dstRate - frac) + c * frac, dstRate).toInt
        }
      w16(out, n, v)
      n += 1
    }
    out
  }
}
