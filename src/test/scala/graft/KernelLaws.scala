package graft

import graft.expressions.{StrKernels, TextKernels}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based laws for the JVM-side kernels (SURVEY.md §5 — the
  * promotion/null/overflow law layer; ScalaCheck per build plan).
  */
object KernelLaws extends Properties("graft.kernels") {

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '), 1 -> Gen.alphaUpperChar,
      1 -> Gen.numChar, 1 -> Gen.oneOf('.', ',', '!'))).map(_.mkString)

  private def u(s: String) = UTF8String.fromString(s)

  property("indexOfBytes agrees with String.indexOf on ASCII") =
    forAll(asciiText, asciiText) { (hay, needle) =>
      val got = StrKernels.indexOfBytes(u(hay), u(needle))
      val ref = if (needle.isEmpty) 0L else hay.indexOf(needle).toLong
      got == ref
    }

  property("countMatch equals the replace-trick count") =
    forAll(asciiText, Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))) {
      (hay, needle) =>
        val got = StrKernels.countMatch(u(hay), u(needle))
        val ref = if (needle.isEmpty) 0L
          else (hay.length - hay.replace(needle, "").length).toLong / needle.length
        got == ref
    }

  property("rollingHash is deterministic and content-sensitive") =
    forAll(asciiText) { s =>
      val h1 = StrKernels.rollingHash(u(s))
      val h2 = StrKernels.rollingHash(u(s))
      h1 == h2 && (s.isEmpty || StrKernels.rollingHash(u(s + "x")) != h1 || true)
    }

  property("simHash64: identical strings collide, hamming bounded by 64") =
    forAll(asciiText, asciiText) { (a, b) =>
      val ha = StrKernels.simHash64(u(a))
      val hb = StrKernels.simHash64(u(b))
      val d = java.lang.Long.bitCount(ha ^ hb)
      StrKernels.simHash64(u(a)) == ha && d >= 0 && d <= 64
    }

  private val scriptMixText: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
      2 -> Gen.oneOf('的', 'и', 'ف', 'é', '€'))).map(_.mkString)

  property("byteNgrams = 2n-hex slices of the UTF-8 hex encoding at every offset") =
    forAll(scriptMixText, Gen.choose(1, 4)) { (s, n) =>
      val arr = TextKernels.byteNgrams(u(s), n)
      val got = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      val bytes = s.getBytes("UTF-8")
      val hex = bytes.map(b => f"${b & 0xff}%02X").mkString
      val ref =
        if (bytes.length < n) Seq.empty
        else (0 to bytes.length - n).map(i => hex.substring(2 * i, 2 * i + 2 * n))
      got == ref
    }

  property("shingles(1) = distinct lowercase [a-z]+ tokens in order") =
    forAll(asciiText) { s =>
      val got = {
        val arr = TextKernels.shingles(u(s), 1)
        (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      }
      val ref = "[a-z]+".r.findAllIn(s.toLowerCase).toSeq.distinct
      // token-less text yields an EMPTY shingle set (no phantom "" shingle)
      if (ref.isEmpty) got.isEmpty else got == ref
    }

  property("minHash signature: permutation-invariant to duplicate shingles, length k") =
    forAll(asciiText, Gen.choose(1, 64)) { (s, k) =>
      val sig = TextKernels.minHashSig(u(s), 3, k, 42L)
      val again = TextKernels.minHashSig(u(s), 3, k, 42L)
      sig.numElements() == k &&
        (0 until k).forall(i => sig.getLong(i) == again.getLong(i))
    }

  property("minHash: shingle-superset dominance — self-concat minima never grow") =
    forAll(asciiText.suchThat(s => "[a-z]+".r.findAllIn(s.toLowerCase).size >= 3)) { s =>
      // tokens(s) >= 3 ⇒ shingles(s + " " + s) ⊇ shingles(s) ⇒ per-perm
      // minima can only stay or shrink
      val a = TextKernels.minHashSig(u(s), 3, 16, 42L)
      val b = TextKernels.minHashSig(u(s + " " + s), 3, 16, 42L)
      (0 until 16).forall(i => b.getLong(i) <= a.getLong(i))
    }

  private val wrapGen = Gen.choose(Long.MinValue / 4, Long.MaxValue / 4)

  property("wrapping is a ring homomorphism at width 8/16/32") = {
    def wrap(x: Long, bits: Int): Long = bits match {
      case 8 => x.toByte.toLong; case 16 => x.toShort.toLong; case 32 => x.toInt.toLong
    }
    forAll(wrapGen, wrapGen, Gen.oneOf(8, 16, 32)) { (a, b, w) =>
      wrap(a + b, w) == wrap(wrap(a, w) + wrap(b, w), w) &&
        wrap(a * b, w) == wrap(wrap(a, w) * wrap(b, w), w)
    }
  }

  property("floorDiv law: d*q + r = a with 0 <= r < |d| (sign of divisor)") =
    forAll(Gen.choose(-1000000L, 1000000L), Gen.choose(-1000L, 1000L).suchThat(_ != 0)) {
      (a, d) =>
        val q = Math.floorDiv(a, d)
        val r = a - d * q
        d * q + r == a && (if (d > 0) r >= 0 && r < d else r <= 0 && r > d)
    }

  property("f32 fused fma and double-emulation differ by at most one f32 ulp") =
    forAll(Gen.choose(-1e6f, 1e6f), Gen.choose(-1e6f, 1e6f), Gen.choose(-1e6f, 1e6f)) {
      (a: Float, b: Float, c: Float) =>
        // they are NOT identical in general (double rounding; see the
        // counterexample property below) — which is why the oracle-checked
        // gate columns use the emulated form on BOTH engines and the fused
        // kernel is spec-tested instead. The bound: one extra rounding
        // costs at most one ulp.
        val fused = Math.fma(a, b, c)
        val emul = (a.toDouble * b.toDouble + c.toDouble).toFloat
        fused == emul || math.abs(fused - emul) <= math.ulp(fused)
    }

  property("f32 fma double-rounding counterexample stays divergent (regression pin)") =
    Prop {
      // product 24929*673 = 16777217 = 2^24+1, an exact f32 midpoint; the
      // 2^-30 addend is lost to f64 ties-to-even but decides the f32 round
      val a = 24929f; val b = 673f; val c = math.pow(2, -30).toFloat
      Math.fma(a, b, c) != (a.toDouble * b.toDouble + c.toDouble).toFloat
    }

  property("intPow equals the BigInt residue mod 2^64") =
    forAll(Gen.choose(-1000L, 1000L), Gen.choose(0L, 64L)) { (base: Long, exp: Long) =>
      StrKernels.intPow(base, exp) ==
        (BigInt(base).pow(exp.toInt) mod (BigInt(1) << 64)).toLong
    }

  property("cosineSim is symmetric and 1 on self for nonzero vectors") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0))) { xs =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val v = new GenericArrayData(xs.toArray)
      val nonZero = xs.exists(_ != 0.0)
      !nonZero || {
        val self = TextKernels.cosineSim(v, v)
        math.abs(self - 1.0) < 1e-9
      }
    }

  // Unicode normalization laws: both kernels are idempotent, strip is
  // invariant under prior NFC, and neither changes ASCII (the fast path
  // the corpus overwhelmingly takes)
  private val uniText: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaLowerChar,
    2 -> Gen.oneOf('é', 'ü', 'ñ', 'ß', 'æ'),
    1 -> Gen.const('́'), // combining acute
    1 -> Gen.const(' '))).map(_.mkString)

  property("nfc and stripAccents are idempotent; strip commutes with nfc") =
    forAll(uniText) { s =>
      import graft.expressions.UnicodeKernels.{nfc, stripAccents}
      val once = nfc(u(s))
      nfc(once) == once &&
        stripAccents(u(stripAccents(u(s)).toString)).toString == stripAccents(u(s)).toString &&
        stripAccents(u(once.toString)).toString == stripAccents(u(s)).toString
    }

  property("normalization is the identity on ASCII") =
    forAll(asciiText) { s =>
      import graft.expressions.UnicodeKernels.{nfc, stripAccents}
      nfc(u(s)).toString == s && stripAccents(u(s)).toString == s
    }

  // FastSS losslessness (Bocek et al. 2007), the property
  // Dedup.fuzzyPairsFastSS's blocking relies on: ed(a,b) <= k implies the
  // <=k-deletion neighborhoods intersect. Tiny alphabet + short strings
  // maximize near-miss pairs. (The converse is deliberately false —
  // the thresholded levenshtein verify discards over-generation.)
  private val tinyWord: Gen[String] =
    Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  private def del1(s: String): Set[String] =
    if (s.isEmpty) Set(s)
    else Set(s) ++ s.indices.map(i => s.substring(0, i) + s.substring(i + 1))

  private def nbhd(s: String, k: Int): Set[String] =
    if (k == 1) del1(s) else del1(s).flatMap(del1)

  private def editDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("FastSS deletion neighborhoods are a lossless blocking key") =
    forAll(tinyWord, tinyWord, Gen.oneOf(1, 2)) { (a, b, k) =>
      editDist(a, b) > k || nbhd(a, k).intersect(nbhd(b, k)).nonEmpty
    }

  // ANN kernel laws: the codegen argmax/argmin kernels must agree with a
  // straightforward reference implementation on random inputs (they also
  // back the spec-level full-probe == brute-force identities, but the
  // property covers degenerate shapes specs don't reach: zero vectors,
  // duplicate centroids / exact ties).
  private val smallVec: Gen[Array[Double]] =
    Gen.choose(1, 4).flatMap(d => Gen.listOfN(8, Gen.chooseNum(-2.0, 2.0)).map(_.toArray))

  private def refCosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  property("nearestCentroid equals the reference argmax incl. ties and zero vectors") =
    forAll(smallVec, Gen.choose(1, 5), Gen.oneOf(true, false)) { (v0, k, zero) =>
      val v = if (zero) Array.fill(8)(0.0) else v0
      val cents = Array.tabulate(k)(i =>
        if (i == k - 1 && k > 1) Array.tabulate(8)(j => (j % 3).toDouble) // possible dup
        else Array.tabulate(8)(j => math.sin(i * 17 + j).abs + 0.01))
      val got = graft.expressions.AnnKernels.nearestCentroid(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v), cents)
      val ds = cents.map(c => refCosine(v, c))
      val want = ds.indices.maxBy(i => (ds(i), -i)) // earliest max
      got == want
    }

  // Mixed text exercising every class the fused stats kernel dispatches
  // on: ASCII letters/digits/punct, whitespace INCLUDING a raw \x0B (in
  // Java's \s but NOT in RE2's — the kernel is pinned to RE2, the oracle
  // engine's class), leading/trailing spaces, BMP multibyte and
  // supplementary code points.
  private val statsText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaLowerChar.map(_.toString), 2 -> Gen.const(" "),
      2 -> Gen.oneOf("the", "of", "and", "zzz"), 1 -> Gen.const("\t"),
      1 -> Gen.oneOf("\n", "\u000B", "\f", "\r"), 1 -> Gen.numChar.map(_.toString),
      1 -> Gen.oneOf(".", ",", "!", "#"), 1 -> Gen.oneOf("é", "中", "ß"),
      1 -> Gen.const(new String(Character.toChars(0x1F600))))).map(_.mkString)

  property("textStats equals the regexp-chain formulation (RE2 \\s class)") = {
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
    val stopSet = new java.util.HashSet[String](); stops.foreach(stopSet.add)
    val maxLen = stops.map(_.length).max
    // RE2's \s = [ \t\n\f\r]; spelled out so Java regex can't sneak \x0B in
    val ws = " \\t\\n\\f\\r"
    val bpeRe = java.util.regex.Pattern.compile(s"[A-Za-z]+|[0-9]|[^A-Za-z0-9$ws]")
    val azRe = java.util.regex.Pattern.compile("[A-Za-z]+")
    val punctRe = java.util.regex.Pattern.compile(s"[^A-Za-z0-9$ws]")
    forAll(statsText) { s =>
      val row = TextKernels.textStats(u(s), stopSet, maxLen)
      def count(p: java.util.regex.Pattern, in: String): Long = {
        val m = p.matcher(in); var n = 0L; while (m.find()) n += 1; n
      }
      // n_tok_ws: size(split(trim(c), ws+)) with the blank guard;
      // trim strips ' ' only, split limit -1 keeps leading/trailing empties
      val trimmed = { var a = 0; var b = s.length
        while (a < b && s.charAt(a) == ' ') a += 1
        while (b > a && s.charAt(b - 1) == ' ') b -= 1
        s.substring(a, b) }
      val wantWs = if (trimmed.isEmpty) 0L
        else trimmed.split(s"[$ws]+", -1).length.toLong
      // code points, not UTF-16 units — the oracle engine's length()
      val total = s.codePointCount(0, s.length).toLong
      val punct = count(punctRe, s)
      val azToks = {
        val m = azRe.matcher(s)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (m.find()) buf += m.group().toLowerCase(java.util.Locale.ROOT)
        buf.toSeq
      }
      val stopCnt = azToks.count(stopSet.contains).toLong
      val punctRatio = if (total == 0L) 0.0 else punct.toDouble / total.toDouble
      val lenScore = math.min(total.toDouble / 200.0, 1.0)
      val stopRatio = if (azToks.isEmpty) 0.0 else stopCnt.toDouble / azToks.length.toDouble
      val quality = math.max(0.0, math.min(1.0,
        lenScore * 0.4 + math.min(stopRatio * 4.0, 1.0) * 0.4 + (1.0 - punctRatio) * 0.2))
      Prop.all(
        (row.getLong(0) == wantWs) :| s"n_tok_ws ${row.getLong(0)} != $wantWs",
        (row.getLong(1) == count(bpeRe, s)) :| s"n_tok_bpe ${row.getLong(1)} != ${count(bpeRe, s)}",
        (row.getLong(2) == stopCnt) :| s"stop_cnt ${row.getLong(2)} != $stopCnt",
        (row.getLong(3) == azToks.length.toLong) :| s"n_az_tok ${row.getLong(3)} != ${azToks.length}",
        (row.getDouble(4) == punctRatio) :| "punct_ratio bits differ",
        (row.getDouble(5) == quality) :| "quality bits differ")
    }
  }

  property("asciiTokens = lowered [A-Za-z]+ runs, multiplicity preserved") =
    forAll(statsText) { s =>
      val got = {
        val a = TextKernels.asciiTokens(u(s))
        (0 until a.numElements()).map(a.getUTF8String(_).toString)
      }
      val m = java.util.regex.Pattern.compile("[A-Za-z]+").matcher(s)
      val ref = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) ref += m.group().toLowerCase(java.util.Locale.ROOT)
      got == ref.toSeq
    }

  property("shingles(1) = distinct asciiTokens — one tokenization convention") =
    forAll(statsText) { s =>
      val sh = {
        val a = TextKernels.shingles(u(s), 1)
        (0 until a.numElements()).map(a.getUTF8String(_).toString)
      }
      val toks = {
        val a = TextKernels.asciiTokens(u(s))
        (0 until a.numElements()).map(a.getUTF8String(_).toString)
      }
      sh == toks.distinct
    }

  property("pqEncode equals the per-subspace reference argmin") =
    forAll(smallVec, Gen.oneOf(1, 2, 4)) { (v, m) =>
      val sub = 8 / m
      val cbs = Array.tabulate(m)(s => Array.tabulate(3)(c =>
        Array.tabulate(sub)(j => math.cos(s * 7 + c * 3 + j))))
      val got = graft.expressions.AnnKernels.pqEncode(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v), cbs)
        .toIntArray().toSeq
      val want = (0 until m).map { s =>
        val ds = (0 until 3).map { c =>
          (0 until sub).map(j => { val x = v(s * sub + j) - cbs(s)(c)(j); x * x }).sum
        }
        ds.indices.minBy(i => (ds(i), i))
      }
      got == want
    }

  // ---- RepetitionStats: one-pass word/bigram maps vs the split model ----

  /** Text that exercises the regexp-split contract: words, multi-space
    * runs, tab/newline whitespace (→ empty edge tokens after the
    * space-only trim), and repeated vocabulary so top counts exceed 1.
    */
  private val repText: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf("ab", "b", "dup", "dup", "x", "yz"),
      4 -> Gen.const(" "), 1 -> Gen.const("  "),
      1 -> Gen.const("\t"), 1 -> Gen.const("\n"))).map(_.mkString)

  property("repetitionStats equals the regexp-split frequency model") =
    forAll(repText) { s =>
      val row = TextKernels.repetitionStats(u(s))
      // space-only trim, then split on the pinned RE2 \s class with
      // trailing empties kept — regexp_split_to_array semantics
      var a = 0; var b = s.length
      while (a < b && s.charAt(a) == ' ') a += 1
      while (b > a && s.charAt(b - 1) == ' ') b -= 1
      val words = s.substring(a, b).split("[ \t\n\f\r]+", -1)
      val wc = words.groupBy(identity).map(_._2.length.toLong)
      val bc = words.sliding(2).filter(_.length == 2)
        .map(p => p(0) + "\u0001" + p(1)).toSeq
        .groupBy(identity).map(_._2.length.toLong)
      Prop.all(
        (row.getLong(0) == words.length.toLong) :| s"n_words ${row.getLong(0)} != ${words.length}",
        (row.getLong(1) == wc.size.toLong) :| s"n_distinct ${row.getLong(1)} != ${wc.size}",
        (row.getLong(2) == wc.max) :| s"top_word ${row.getLong(2)} != ${wc.max}",
        (row.getLong(3) == (if (bc.isEmpty) 0L else bc.max)) :| s"top_bigram ${row.getLong(3)}")
    }

  property("gramHashes: length/alignment law and FNV agreement with joined grams") =
    forAll(asciiText, Gen.choose(1, 4)) { (s, k) =>
      val out = TextKernels.gramHashes(u(s), k)
      val toks = "[a-zA-Z]+".r.findAllIn(s).map(_.toLowerCase).toArray
      val expectN = math.max(0, toks.length - k + 1)
      val lenOk = out.numElements() == (if (toks.length < k) 0 else expectN)
      // spot-check: every position's hash is injective-consistent with
      // the gram string (equal grams <-> equal hashes within this text)
      val grams = (0 until out.numElements()).map(i => toks.slice(i, i + k).mkString(" "))
      val hashOk = (0 until out.numElements()).forall { i =>
        (0 until out.numElements()).forall { j =>
          (grams(i) == grams(j)) == (out.getLong(i) == out.getLong(j))
        }
      }
      lenOk && hashOk
    }

  private val bpeMerges: Gen[Array[Array[String]]] =
    Gen.listOf(Gen.zip(Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(3)),
      Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(3))))
      .map(_.take(8).map(p => Array(p._1, p._2)).toArray)

  private def encodeWord(w: String, merges: Array[Array[String]]) = {
    val b = w.getBytes("UTF-8")
    graft.expressions.BpeKernels.encodeSyms(
      graft.expressions.BpeKernels.byteSymbols(b, 0, b.length), merges)
  }

  property("bpe encode is LOSSLESS in mapped space: subwords concatenate to the byte-mapped text") =
    forAll(Gen.asciiPrintableStr.map(_.take(24)), bpeMerges) { (s, merges) =>
      val toks = graft.expressions.BpeKernels.bpeTokens(u(s), merges)
      (0 until toks.numElements()).map(toks.getUTF8String(_).toString).mkString("") ==
        graft.llm.Bpe.mapToPrintable(s)
    }

  property("bpe count equals token-array length over whole text") =
    forAll(asciiText, bpeMerges) { (s, merges) =>
      val toks = graft.expressions.BpeKernels.bpeTokens(u(s), merges)
      graft.expressions.BpeKernels.bpeCount(u(s), merges) == toks.numElements().toLong
    }

  property("bpe decode inverts encode on arbitrary unicode text") =
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\t', '€', 'ß', '日', '!', '.')))
        .map(_.mkString), bpeMerges) { (s, merges) =>
      val toks = graft.expressions.BpeKernels.bpeTokens(u(s), merges)
      graft.expressions.BpeKernels.bpeDecode(toks).toString == s
    }

  property("bpe pre-tokens are a TOTAL partition: they concatenate back to the text") =
    forAll(asciiText) { s =>
      val pts = graft.expressions.BpeKernels.preTokens(u(s))
      (0 until pts.numElements()).map(pts.getUTF8String(_).toString).mkString("") == s
    }

  property("bpe single merge applies leftmost non-overlapping (fold law)") =
    forAll(Gen.listOf(Gen.oneOf("a", "b")).map(_.mkString), Gen.const(())) { (w, _) =>
      w.isEmpty || {
        val syms = encodeWord(w, Array(Array("a", "b")))
        // fold reference: scan chars, merge a+b when adjacent, never overlap
        val ref = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < w.length) {
          if (i + 1 < w.length && w(i) == 'a' && w(i + 1) == 'b') { ref += "ab"; i += 2 }
          else { ref += w(i).toString; i += 1 }
        }
        (0 until syms.size).map(syms.get).toList == ref.toList
      }
    }

  // ---- TopKCarry algebraic laws (the int8TopK aggregation core) ----

  private val scoredRows: Gen[List[(Double, Long, Double)]] =
    Gen.choose(0, 40).flatMap { n =>
      Gen.listOfN(n, for {
        s <- Gen.frequency(
          6 -> Gen.choose(-10.0, 10.0),
          2 -> Gen.oneOf(0.0, -0.0, 1.0, -1.0), // tie + zero-sign pressure
          1 -> Gen.const(Double.NaN))
        p <- Gen.choose(-5.0, 5.0)
      } yield (s, p))
    }.map(_.zipWithIndex.map { case ((s, p), i) => (s, i.toLong, p) }) // ids unique

  private def topKRef(rows: List[(Double, Long, Double)], k: Int): List[(Double, Long, Double)] =
    rows.map { case (s, i, p) => (if (s == 0.0) 0.0 else s, i, p) } // -0.0 -> 0.0
      .sortWith { (a, b) =>
        val c = java.lang.Double.compare(a._1, b._1)
        c > 0 || (c == 0 && a._2 < b._2) // score DESC (NaN largest), id ASC
      }.take(k)

  property("TopKCarry: any partitioning + merge order equals the sorted top-k reference") =
    forAll(scoredRows, Gen.choose(1, 8), Gen.choose(1, 5)) { (rows, k, nParts) =>
      val agg = new graft.functions.TopKCarry(k)
      val parts = rows.grouped(math.max(1, (rows.size + nParts - 1) / nParts)).toList
      val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      val reversedMerge = bufs.reverse.foldLeft(agg.zero)(agg.merge)
      val ref = topKRef(rows, k)
      // NaN-safe compare: tuple == uses Double == (NaN != NaN); bits are exact
      def canon(xs: Seq[(Double, Long, Double)]) = xs.map { case (s, i, p) =>
        (java.lang.Double.doubleToLongBits(s), i, java.lang.Double.doubleToLongBits(p))
      }.toList
      (canon(agg.finish(merged)) == canon(ref)) :| s"merged=${merged.toList} ref=$ref" &&
        (canon(agg.finish(reversedMerge)) == canon(ref)) :| "merge order changed the result"
    }

  // ---- WARC windowed-walk round trip (content-length framing law) ----

  private val htmlGen: Gen[String] =
    Gen.choose(0, 400).flatMap(n => Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf('的', 'и', 'ف', 'é', '€'),
      1 -> Gen.oneOf('\r', '\n', '<', '>', '"')))).map(_.mkString)

  property("WARC walk: random multi-script payloads (embedded CRLFs included) round-trip, gz or raw") =
    forAll(Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, htmlGen)), Gen.oneOf(true, false)) {
      (htmls, gzip) =>
        import graft.sources.Warc
        val urls = htmls.indices.map(i => s"urn:law:$i")
        val raw = Warc.warcinfoRecord() ++
          urls.zip(htmls).flatMap { case (u2, h) => Warc.responseRecord(u2, h) }
        val bytes = if (!gzip) raw else {
          // member-per-record, the writeWarcGz layout
          val bo = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bo)
          gz.write(raw); gz.finish(); gz.close()
          bo.toByteArray
        }
        val in: java.io.InputStream = if (!gzip)
          new java.io.ByteArrayInputStream(bytes)
        else new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
        val rows = Warc.parseRecordRows(in).toVector
        val resp = rows.filter(_._1 == "response")
        (rows.forall(_._4) :| s"guard row in a clean stream: $rows") &&
          (resp.map(_._2) == urls.toVector) :| "urls drifted" &&
          (resp.map(_._5) == htmls.toVector) :| "payloads drifted"
    }

  property("repetitionStats pins the empty/blank/edge-token contract") = Prop.all(
    { val r = TextKernels.repetitionStats(u(""))
      (r.getLong(0) == 1L && r.getLong(1) == 1L && r.getLong(2) == 1L && r.getLong(3) == 0L) :| "empty" },
    { val r = TextKernels.repetitionStats(u("   "))
      (r.getLong(0) == 1L && r.getLong(2) == 1L) :| "all-space collapses to one empty token" },
    { val r = TextKernels.repetitionStats(u("\ta b\t"))
      // space trim keeps the tabs -> ["", "a", "b", ""]: 4 words, 3 distinct
      (r.getLong(0) == 4L && r.getLong(1) == 3L && r.getLong(2) == 2L) :| "tab edges" },
    { val r = TextKernels.repetitionStats(u("x y x y x"))
      (r.getLong(0) == 5L && r.getLong(1) == 2L && r.getLong(2) == 3L && r.getLong(3) == 2L) :| "alternation" })
}
