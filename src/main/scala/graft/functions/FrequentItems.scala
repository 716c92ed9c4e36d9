package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed Aggregator (§2.12 surface,
  * the frequency sibling of the HLL cardinality estimator, reference
  * estimator surface: minarrow src/kernels/aggregate.rs value-count path).
  *
  * Keeps at most `k` (term, count) entries. Whenever the buffer would
  * exceed `k` terms, the (k+1)-th largest count is subtracted from every
  * entry and non-positive entries are dropped — the mergeable-summaries
  * formulation (Agarwal et al., PODS'12), which makes `merge` a plain
  * map-sum followed by the same compaction. Guarantees, for a stream of N
  * tokens:
  *
  *  - every term with true count > N/(k+1) survives in the summary;
  *  - for every surviving term, est ≤ true ≤ est + N/(k+1).
  *
  * Scale story: the exact form shuffles one row per DISTINCT term
  * (fine for word-ish vocabularies, fatal for URLs / n-grams at 100 TB);
  * this Aggregator is algebraic — partial state is ≤ 2k entries per map
  * task, the shuffle carries ≤ 2k entries per partition, and the driver
  * never sees more than 2k rows. ScaleSpec checks both guarantees against
  * exact counts under randomized partitioning.
  */
class FrequentItems(k: Int) extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k > 0, s"k must be positive: $k")

  /** Drop to ≤ k entries by subtracting the (k+1)-th largest count.
    * Buffers are allowed to grow to 2k between compactions so the O(n log n)
    * sort amortizes to O(1) per token.
    */
  private def compress(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val counts = m.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val delta = counts(counts.length - (k + 1)) // (k+1)-th largest
      m.collect { case (t, c) if c > delta => (t, c - delta) }
    }

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], term: String): Map[String, Long] = {
    val grown = m.updated(term, m.getOrElse(term, 0L) + 1L)
    if (grown.size >= 2 * k) compress(grown) else grown
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    compress(b.foldLeft(a) { case (acc, (t, c)) => acc.updated(t, acc.getOrElse(t, 0L) + c) })

  /** Final compaction + deterministic ordering: count DESC, term ASC. The
    * counts themselves depend on merge order (inherent to MG), so gate
    * queries over this output are rows-only; the spec checks the bounds.
    */
  override def finish(m: Map[String, Long]): Seq[(String, Long)] =
    compress(m).toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
