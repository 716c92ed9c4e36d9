package graft

import graft.expressions.BpeKernels
import graft.llm.Bpe
import org.apache.spark.sql.functions._

/** Deterministic FULL-BYTE BPE: artifact reproducibility, encode laws
  * over the 256-byte alphabet + byte-run pre-tokenizer, and the count
  * column the token-budgeted operators price in.
  */
class SubwordSpec extends SparkSpec {
  import spark.implicits._

  test("frozen merge artifact is byte-reproducible from the training fixture") {
    val retrained = Bpe.trainMerges(
      Tables.documents(spark, "/root/testdata/sf0.001"), "text",
      Bpe.frozenMerges.length)
    assert(retrained === Bpe.frozenMerges)
  }

  test("encode concatenates back to the byte-mapped pre-token; count equals encode length") {
    val words = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(Bpe.preTokens(col("text"))).as("w"))
      .distinct()
    val enc = words.select(col("w"), Bpe.encode(col("w")).as("tk"),
      Bpe.countTokens(col("w")).as("n")).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val w = r.getString(0)
      val tk = r.getSeq[String](1)
      assert(tk.mkString("") === Bpe.mapToPrintable(w), s"lossless split broken for $w")
      assert(r.getLong(2) === tk.length.toLong, s"count != encode length for $w")
    }
  }

  test("merges apply in rank order, each exhaustively leftmost (hand case)") {
    // merges: (a,b) then (ab,b): "ababb" -> [ab, ab, b] -> [ab, abb];
    // the space pre-token maps to the printable space symbol (U+0120)
    val m = Seq(("a", "b"), ("ab", "b"))
    val out = Seq(Tuple1("ababb xabba")).toDF("t")
      .select(Bpe.encode(col("t"), m).as("tk")).head.getSeq[String](0)
    // "xabba": x a b b a -> x ab b a (leftmost, non-overlap) -> x abb a
    assert(out === Seq("ab", "abb", BpeKernels.ByteSym(' '.toInt), "x", "abb", "a"))
  }

  test("token ids: base ids 0-255 are the byte values; merges mint 256+") {
    val m = Seq(("a", "b"), ("ab", "b"))
    val v = Bpe.vocab(m)
    assert(v.take(256) === BpeKernels.ByteSym.toSeq)
    assert(v.drop(256) === Seq("ab", "abb"))
    val ids = Seq(Tuple1("ababb z")).toDF("t")
      .select(Bpe.tokenIds(Bpe.encode(col("t"), m), m).as("ids"))
      .head.getSeq[Int](0)
    assert(ids === Seq(256, 257, ' '.toInt, 'z'.toInt))
  }

  test("multi-pre-token text: per-pre-token encodes concatenate in order; count sums") {
    val text = "Window ORDER by window"
    val df = Seq(Tuple1(text)).toDF("t")
    val tk = df.select(Bpe.encode(col("t")).as("tk")).head.getSeq[String](0)
    val pres = df.select(Bpe.preTokens(col("t")).as("p")).head.getSeq[String](0)
    // case is PRESERVED and whitespace is priced: the pre-token stream
    // alternates word / single-space and concatenates back to the text
    assert(pres === Seq("Window", " ", "ORDER", " ", "by", " ", "window"))
    assert(pres.mkString("") === text)
    val singles = pres.flatMap { w =>
      Seq(Tuple1(w)).toDF("t").select(Bpe.encode(col("t")).as("tk"))
        .head.getSeq[String](0)
    }
    assert(tk === singles)
    val n = df.select(Bpe.countTokens(col("t"))).head.getLong(0)
    assert(n === singles.length.toLong)
  }

  test("every byte is priced: digits, punctuation, whitespace, non-Latin count > 0") {
    val df = Seq(
      (0L, null.asInstanceOf[String]),
      (1L, ""),
      (2L, "123 !!"),
      (3L, "日本語"),          // 9 UTF-8 bytes, one 'other' pre-token
      (4L, "naïve — prix: 3,99 €"),
      (5L, "\t\n")             // pure whitespace run
    ).toDF("id", "t")
    val got = df.select(col("id"), Bpe.countTokens(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // null text -> null count (null-safe eval); empty -> 0; everything
    // else carries token mass (the [a-z]-only alphabet priced 2-5 at 0)
    assert(got(0L) === -1L)
    assert(got(1L) === 0L)
    assert(got(2L) === 6L)   // "123" (3) + " " (1) + "!!" (2), no trained merges apply
    assert(got(3L) === 9L)   // one sym per UTF-8 byte
    assert(got(4L) > 0L && got(5L) > 0L)
    // multibyte characters never split across pre-tokens (their bytes
    // share the 'other' class) and encode is lossless in mapped space
    val jp = Seq(Tuple1("日本語 ok")).toDF("t")
      .select(Bpe.encode(col("t")).as("tk")).head.getSeq[String](0)
    assert(jp.mkString("") === Bpe.mapToPrintable("日本語 ok"))
  }

  test("BPE chunking windows tile the subword stream (stride reassembly)") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001").limit(20)
    val chunks = graft.llm.Chunking.chunkByTokens(df, "doc_id", "text",
        size = 24, stride = 16, tokenize = Bpe.encode(_))
      .collect().groupBy(_.getLong(0))
    val streams = df.select(col("doc_id"), Bpe.encode(col("text")).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    chunks.foreach { case (id, cs) =>
      val stream = streams(id)
      cs.sortBy(_.getLong(1)).foreach { c =>
        val start = c.getLong(1).toInt * 16
        val expect = stream.slice(start, start + 24)
        assert(c.getString(2) === expect.mkString(" "),
          s"doc $id chunk ${c.getLong(1)} mismatched")
        assert(c.getLong(3) === expect.length.toLong)
      }
    }
  }

  test("training is deterministic under repartition (order-independent argmax)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Bpe.trainMerges(docs.repartition(7), "text", 10)
    val b = Bpe.trainMerges(docs.repartition(3), "text", 10)
    assert(a === b)
    assert(a === Bpe.frozenMerges.take(10))
  }
}
