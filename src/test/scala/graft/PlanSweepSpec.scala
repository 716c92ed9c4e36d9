package graft

import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window => LWindow}

/** Registry-wide scale anti-pattern sweep.
  *
  * The per-operator specs assert plan properties for the handful of queries
  * they own (bucketed no-shuffle, asOf keys-only exchanges, RangeJoin
  * nested-loop rewrite, broadcast-not-sort-merge index scans). This spec is
  * the complement: it walks EVERY query in the gate registry and rejects the
  * two plan shapes that are always wrong at 100 TB regardless of operator —
  *
  *   1. a join with no condition (logical Cross / condition-less Join →
  *      cartesian or BroadcastNestedLoop at physical planning), unless the
  *      query is on the bounded-by-contract allowlist (a crossJoin against a
  *      driver-bounded broadcast probe set is the documented ANN idiom);
  *   2. an unpartitioned Window — every row through one task.
  *
  * So a future edit to any of the ~140 query builders that accidentally
  * drops a join key or a partitionBy fails here by name, instead of
  * surfacing as an OOM three decades of scale later.
  *
  * Streaming-harness queries are excluded: their builders run real
  * micro-batch streams to completion (multi-second each; plan shapes for
  * those pipelines are asserted in StreamingSpec/LlmSpec), and the frame
  * they return is a read-back of materialized results with no distributed
  * plan left to sweep.
  */
class PlanSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Builders that drain an actual stream (foreachBatch / awaitTermination)
    * before returning. Everything they plan is spec-asserted where built.
    */
  private val streamingHarness: Set[String] = Set(
    "q43_stream_windowed", "q44_sessionize", "q59_sliding_window",
    "q73_stream_dedup", "q74_stream_stream_join", "q97_arrowdir_stream",
    "q103_sessionize_tws", "q115_stream_outer_join", "q129_stream_static_join",
    "q136_stream_near_dedup", "q158_stream_source_kl", "q170_stream_quality_select",
    "q171_stream_nb_train")

  /** Condition-less joins that are bounded by contract, with the bound:
    *   - q35/q36/q72/q130/q131: ANN top-k — crossJoin/nested-loop against the
    *     BROADCAST probe/query set (driver-bounded, llm/Similarity.scala);
    *     the corpus side streams through it exactly once.
    *   - q201: semantic decontamination — cross against the benchmark
    *     DataFrame, which is BROADCAST (a bounded set by contract,
    *     Similarity.semanticDecontaminate); map-side partial max means one
    *     row per corpus vector reaches the exchange (ScaleSpec-asserted).
    *   - q202: int8 quantized top-k — the same bounded-broadcast contract
    *     as q35 (Similarity.int8TopK's query DataFrame is broadcast).
    */
  private val boundedCrossAllowlist: Set[String] =
    Set("q35_cosine_topk", "q36_cosine_lsh_topk", "q72_ivf_topk",
      "q130_pq_topk", "q131_ivfpq_topk",
      "q201_semantic_decontam", "q202_int8_quant_topk")

  private def violations(name: String, plan: LogicalPlan): Seq[String] = {
    // A cross join where one side is PROVABLY at most one row (Catalyst's
    // own maxRows bound: an ungrouped Aggregate, a LIMIT 1, …) is the
    // scalar-broadcast idiom (join a global total/ratio onto every row) —
    // one broadcast value, no blowup, safe at any scale.
    def scalarSide(j: Join): Boolean =
      j.left.maxRows.exists(_ <= 1L) || j.right.maxRows.exists(_ <= 1L)
    val crosses =
      if (boundedCrossAllowlist(name)) Nil
      else plan.collect {
        case j: Join if (j.condition.isEmpty || j.joinType == Cross) && !scalarSide(j) =>
          s"$name: condition-less/cross join: ${j.simpleString(120)}"
      }
    val oneTaskWindows = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty =>
        s"$name: unpartitioned Window: ${w.simpleString(120)}"
    }
    crosses ++ oneTaskWindows
  }

  test("no gate query plans a cartesian join or an unpartitioned Window (registry sweep)") {
    val swept = SparkEntry.allDefs.filterNot(q => streamingHarness(q.name))
    assert(swept.size > 100, s"sweep unexpectedly small: ${swept.size} queries")
    val bad = swept.flatMap { q =>
      val df =
        try q.fn(spark, dir)
        catch { case e: Throwable => fail(s"${q.name} failed to build: ${e.getMessage}") }
      violations(q.name, df.queryExecution.optimizedPlan)
    }
    assert(bad.isEmpty, s"scale anti-patterns:\n${bad.mkString("\n")}")
  }
}
