package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a typed Aggregator (§2.12 surface, the
  * UDAF sibling of OrderedConcat): keeps the k largest (score, id) pairs,
  * ordered score DESC with id ASC as the deterministic tie-break.
  *
  * Scale story: the idiomatic window form
  * (`row_number().over(partitionBy(g).orderBy(score.desc))  <= k`) shuffles
  * and sorts EVERY row of every group; this Aggregator is algebraic —
  * partial aggregation caps state at k pairs per group per map task, the
  * shuffle carries at most k pairs per (group, partition), and no sort of
  * the full data ever happens. At 100 TB that's the difference between a
  * full-data exchange and a k·numPartitions one.
  *
  * The buffer is a plain sorted Vector (insert cost O(k)) — right for the
  * small k of "top items per group" reporting; not a general sorted-agg
  * replacement.
  */
class TopK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive: $k")

  /** score DESC, id ASC — total order, so results are deterministic.
    * Double.compare gives SQL ORDER BY semantics at the edges: NaN sorts
    * as the LARGEST score (rank 1 in a DESC window), and -0.0 is
    * normalized to 0.0 on insert so the id tie-break, not the sign bit,
    * decides between zeros — both matching the window-form oracle.
    */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def norm(v: (Double, Long)): (Double, Long) =
    if (v._1 == 0.0) (0.0, v._2) else v

  private def insert(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] = {
    val at = buf.indexWhere(x => better(v, x)) match {
      case -1 => buf.length
      case i => i
    }
    if (at >= k) buf
    else (buf.take(at) :+ v) ++ buf.drop(at).take(k - at - 1)
  }

  override def zero: Seq[(Double, Long)] = Vector.empty
  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, norm(in))
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}

/** [[TopK]] with a carried payload: keeps the k largest (score, id)
  * triples under the SAME total order (score DESC, id ASC, -0.0/NaN
  * normalized identically), but each kept entry carries an extra Double
  * the ordering never consults. Exists for rank-on-rounded contracts
  * (int8TopK ranks on round(cos, 4) but must RETURN the raw cosine):
  * without the payload the raw value would need a second corpus scan to
  * recover. Same algebraic scale story as [[TopK]] — partial aggregation
  * caps state at k triples per group per map task.
  */
class TopKCarry(k: Int)
    extends Aggregator[(Double, Long, Double), Seq[(Double, Long, Double)], Seq[(Double, Long, Double)]] {
  require(k > 0, s"k must be positive: $k")

  private def better(a: (Double, Long, Double), b: (Double, Long, Double)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def norm(v: (Double, Long, Double)): (Double, Long, Double) =
    if (v._1 == 0.0) (0.0, v._2, v._3) else v

  private def insert(buf: Seq[(Double, Long, Double)],
      v: (Double, Long, Double)): Seq[(Double, Long, Double)] = {
    val at = buf.indexWhere(x => better(v, x)) match {
      case -1 => buf.length
      case i => i
    }
    if (at >= k) buf
    else (buf.take(at) :+ v) ++ buf.drop(at).take(k - at - 1)
  }

  override def zero: Seq[(Double, Long, Double)] = Vector.empty
  override def reduce(buf: Seq[(Double, Long, Double)],
      in: (Double, Long, Double)): Seq[(Double, Long, Double)] =
    insert(buf, norm(in))
  override def merge(a: Seq[(Double, Long, Double)],
      b: Seq[(Double, Long, Double)]): Seq[(Double, Long, Double)] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[(Double, Long, Double)]): Seq[(Double, Long, Double)] = buf
  override def bufferEncoder: Encoder[Seq[(Double, Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long, Double)]] = bufferEncoder
}
