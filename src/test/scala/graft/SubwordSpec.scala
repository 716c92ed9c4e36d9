package graft

import graft.llm.Bpe
import org.apache.spark.sql.functions._

/** Deterministic byte-level BPE: artifact reproducibility, encode laws,
  * and the count column the token-budgeted operators price in.
  */
class SubwordSpec extends SparkSpec {
  import spark.implicits._

  test("frozen merge artifact is byte-reproducible from the training fixture") {
    val retrained = Bpe.trainMerges(
      Tables.documents(spark, "/root/testdata/sf0.001"), "text",
      Bpe.frozenMerges.length)
    assert(retrained === Bpe.frozenMerges)
  }

  test("encode concatenates back to the word; count equals encode length") {
    val words = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(graft.llm.TextAnalysis.wordTokens(col("text"))).as("w"))
      .distinct()
    val enc = words.select(col("w"), Bpe.encode(col("w")).as("tk"),
      Bpe.countTokens(col("w")).as("n")).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val w = r.getString(0)
      val tk = r.getSeq[String](1)
      assert(tk.mkString("") === w, s"lossless split broken for $w")
      assert(r.getLong(2) === tk.length.toLong, s"count != encode length for $w")
    }
  }

  test("merges apply in rank order, each exhaustively leftmost (hand case)") {
    // merges: (a,b) then (ab,b): "ababb" -> [ab, ab, b] -> [ab, abb]
    val m = Seq(("a", "b"), ("ab", "b"))
    val out = Seq(Tuple1("ababb xabba")).toDF("t")
      .select(Bpe.encode(col("t"), m).as("tk")).head.getSeq[String](0)
    // "xabba": x a b b a -> x ab b a (leftmost, non-overlap) -> x abb a
    assert(out === Seq("ab", "abb", "x", "abb", "a"))
  }

  test("token ids are the first-occurrence vocabulary index, base letters 0-25") {
    val m = Seq(("a", "b"), ("ab", "b"))
    val v = Bpe.vocab(m)
    assert(v.take(26) === ('a' to 'z').map(_.toString))
    assert(v.drop(26) === Seq("ab", "abb"))
    val ids = Seq(Tuple1("ababb z")).toDF("t")
      .select(Bpe.tokenIds(Bpe.encode(col("t"), m), m).as("ids"))
      .head.getSeq[Int](0)
    assert(ids === Seq(26, 27, 25))
  }

  test("multi-word text: per-word encodes concatenate in order; count sums") {
    val df = Seq(Tuple1("Window ORDER by window")).toDF("t")
    val tk = df.select(Bpe.encode(col("t")).as("tk")).head.getSeq[String](0)
    val singles = Seq("window", "order", "by", "window").flatMap { w =>
      Seq(Tuple1(w)).toDF("t").select(Bpe.encode(col("t")).as("tk"))
        .head.getSeq[String](0)
    }
    assert(tk === singles)
    val n = df.select(Bpe.countTokens(col("t"))).head.getLong(0)
    assert(n === singles.length.toLong)
  }

  test("null, empty, and letterless text count zero tokens") {
    val df = Seq((0L, null.asInstanceOf[String]), (1L, ""), (2L, "123 !!"))
      .toDF("id", "t")
    val got = df.select(col("id"), Bpe.countTokens(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // null text -> null count (null-safe eval), empty/letterless -> 0
    assert(got === Map(0L -> -1L, 1L -> 0L, 2L -> 0L))
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
