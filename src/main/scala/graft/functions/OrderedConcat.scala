package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for order-sensitive string reduction (SURVEY.md
  * §2.12 / §7.3 — the reference's `join_str` preserves input order,
  * src/kernels/string.rs:1889; distributed execution has no input order,
  * so the order is carried explicitly as a sort key).
  *
  * Buffer is the collected (key, value) list; merge is list concat;
  * finish sorts once. Registered via `functions.udaf` it becomes a
  * regular aggregate expression with partial+final execution.
  */
class OrderedConcat(delim: String)
    extends Aggregator[(Long, String), List[(Long, String)], String] {
  override def zero: List[(Long, String)] = Nil
  override def reduce(b: List[(Long, String)], a: (Long, String)): List[(Long, String)] = a :: b
  override def merge(b1: List[(Long, String)], b2: List[(Long, String)]): List[(Long, String)] =
    b1 ::: b2
  override def finish(r: List[(Long, String)]): String =
    r.sortBy(_._1).map(_._2).mkString(delim)
  override def bufferEncoder: Encoder[List[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, String)]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
