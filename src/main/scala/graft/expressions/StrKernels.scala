package graft.expressions

import org.apache.spark.unsafe.types.UTF8String

/** Static byte-level string kernels referenced from generated code (must be
  * public + JVM-static for whole-stage codegen to call them).
  */
object StrKernels {

  /** Wrapping integer power — Rust `i64::pow(u32)` release semantics
    * (minarrow's integer Power path, src/kernels/arithmetic/std.rs:67):
    * multiplication mod 2^64, exponent coerced via `to_u32().unwrap_or(0)`
    * (negative or > u32::MAX → 0 → result 1). Square-and-multiply gives the
    * same residue as naive repeated multiplication (mod-2^64 is a ring).
    */
  def intPow(base: Long, exp: Long): Long = {
    val e = if (exp < 0L || exp > 0xffffffffL) 0L else exp
    var result = 1L
    var b = base
    var n = e
    while (n > 0) {
      if ((n & 1L) == 1L) result *= b
      b *= b
      n >>= 1
    }
    result
  }

  /** 0-based byte offset of first occurrence, -1 if absent; empty needle → 0. */
  def indexOfBytes(hay: UTF8String, needle: UTF8String): Long = {
    val h = hay.getBytes
    val n = needle.getBytes
    if (n.length == 0) return 0L
    if (n.length > h.length) return -1L
    var i = 0
    val limit = h.length - n.length
    while (i <= limit) {
      var j = 0
      while (j < n.length && h(i + j) == n(j)) j += 1
      if (j == n.length) return i.toLong
      i += 1
    }
    -1L
  }

  /** Non-overlapping occurrence count. Empty needle → char count + 1: the
    * reference delegates to Rust `str::matches` (count_match_str,
    * string.rs:1408), which yields an empty match at every char boundary
    * including both ends — "abc".matches("").count() == 4.
    */
  def countMatch(hay: UTF8String, needle: UTF8String): Long = {
    val h = hay.getBytes
    val n = needle.getBytes
    if (n.length == 0) return hay.numChars().toLong + 1L
    if (n.length > h.length) return 0L
    var i = 0
    var count = 0L
    val limit = h.length - n.length
    while (i <= limit) {
      var j = 0
      while (j < n.length && h(i + j) == n(j)) j += 1
      if (j == n.length) { count += 1; i += n.length }
      else i += 1
    }
    count
  }

  /** First byte offset of `n` in `h` starting at `from`, -1 if absent. */
  private def findBytes(h: Array[Byte], n: Array[Byte], from: Int): Int = {
    var i = from
    val limit = h.length - n.length
    while (i <= limit) {
      var j = 0
      while (j < n.length && h(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  /** String Subtract — remove the FIRST occurrence of `needle` (byte
    * search; UTF-8 self-synchronization keeps the splice on char
    * boundaries). Empty or absent needle → unchanged. Reference:
    * apply_str_str Subtract, src/kernels/arithmetic/string.rs:740.
    */
  def subtractFirst(hay: UTF8String, needle: UTF8String): UTF8String = {
    val h = hay.getBytes
    val n = needle.getBytes
    if (n.length == 0) return hay
    val p = findBytes(h, n, 0)
    if (p < 0) return hay
    val out = new Array[Byte](h.length - n.length)
    System.arraycopy(h, 0, out, 0, p)
    System.arraycopy(h, p + n.length, out, p, h.length - p - n.length)
    UTF8String.fromBytes(out)
  }

  /** String Divide — split on each non-overlapping occurrence of `sep`
    * (left-to-right) and rejoin with '|'. Empty sep → unchanged.
    * Reference: apply_str_str Divide, src/kernels/arithmetic/string.rs:757.
    */
  def divideSep(hay: UTF8String, sep: UTF8String): UTF8String = {
    val h = hay.getBytes
    val s = sep.getBytes
    if (s.length == 0) return hay
    val out = new java.io.ByteArrayOutputStream(h.length)
    var start = 0
    var p = findBytes(h, s, start)
    while (p >= 0) {
      out.write(h, start, p - start)
      out.write('|')
      start = p + s.length
      p = findBytes(h, s, start)
    }
    out.write(h, start, h.length - start)
    UTF8String.fromBytes(out.toByteArray)
  }

  /** Reference cap on string Multiply repetitions
    * (STRING_MULTIPLICATION_LIMIT, src/kernels/arithmetic/string.rs:71).
    */
  final val StringMulLimit = 1000000

  /** String Multiply — `a` repeated by the BYTE length of `b`, capped at
    * [[StringMulLimit]]. Reference: apply_str_str Multiply,
    * src/kernels/arithmetic/string.rs:751 (`a.len() * b.len().min(LIMIT)`).
    */
  def multiplyByLen(a: UTF8String, b: UTF8String): UTF8String = {
    val bytes = a.getBytes
    val times = math.min(b.numBytes(), StringMulLimit)
    val out = new Array[Byte](bytes.length * times)
    var i = 0
    while (i < times) {
      System.arraycopy(bytes, 0, out, i * bytes.length, bytes.length)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  private final val Mod = (1L << 61) - 1
  private final val Base = 257L

  /** Polynomial rolling hash mod 2^61-1 over UTF-8 bytes. */
  def rollingHash(s: UTF8String): Long = {
    val b = s.getBytes
    var acc = 0L
    var i = 0
    while (i < b.length) {
      // (acc * 257 + byte) mod (2^61-1) via 128-bit intermediate
      acc = Math.floorMod(multiplyMod(acc, Base) + (b(i) & 0xffL), Mod)
      i += 1
    }
    acc
  }

  private def multiplyMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1: (hi*2^64 + lo) mod (2^61-1)
    val loMod = (lo & Mod) + (lo >>> 61)
    val hiMod = multiplyPow64Mod(hi)
    Math.floorMod(loMod + hiMod, Mod)
  }

  private def multiplyPow64Mod(hi: Long): Long =
    // 2^64 mod (2^61-1) = 8, so hi*2^64 ≡ hi*8
    Math.floorMod(hi << 3, Mod)

  /** FNV-1a 64-bit over a byte range. */
  private def fnv1a(b: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Unweighted 64-bit Charikar SimHash over whitespace-delimited tokens. */
  def simHash64(s: UTF8String): Long = {
    val b = s.getBytes
    val counters = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= b.length) {
      val isSep = i == b.length || b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r'
      if (isSep) {
        if (i > start) {
          val h = fnv1a(b, start, i)
          var bit = 0
          while (bit < 64) {
            if (((h >>> bit) & 1L) == 1L) counters(bit) += 1 else counters(bit) -= 1
            bit += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (counters(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Engine-portable 64-bit SimHash: same fold as [[simHash64]] but the
    * per-token bit source is md5's first 8 bytes read as two big-endian
    * 32-bit halves (hex digits 1-8 → hi, 9-16 → lo; signature bits 0-31
    * vote from lo, 32-63 from hi) — reproducible digit-for-digit by any
    * SQL engine with md5. Separators are the RE2 \s class ([ \t\n\f\r],
    * the oracle's string_split_regex semantics).
    */
  def simHashMd5(s: UTF8String): Long = {
    val b = s.getBytes
    val md = md5Local.get()
    val counters = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= b.length) {
      val isSep = i == b.length || b(i) == ' ' || b(i) == '\t' ||
        b(i) == '\n' || b(i) == '\f' || b(i) == '\r'
      if (isSep) {
        if (i > start) {
          md.reset()
          md.update(b, start, i - start)
          val d = md.digest()
          val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          val lo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
          var bit = 0
          while (bit < 32) {
            if (((lo >>> bit) & 1L) == 1L) counters(bit) += 1 else counters(bit) -= 1
            if (((hi >>> bit) & 1L) == 1L) counters(bit + 32) += 1 else counters(bit + 32) -= 1
            bit += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (counters(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }
}
