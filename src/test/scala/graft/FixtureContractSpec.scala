package graft

import org.apache.spark.sql.types._

/** Driver-fixture schema contract — the round-7 lesson generalized.
  *
  * The driver regenerates `/root/testdata` between rounds; round 7's
  * regeneration silently changed `events.ts` from TIMESTAMP(NANOS) to
  * `timestamp[us]` and took down 27 gate queries before any operator ran.
  * `Tables.normalizeTs` now adapts, and EventsIngestSpec pins that
  * boundary — this spec covers every OTHER table, so the next drift fails
  * HERE with a message naming the column and the adaptive boundary to
  * extend, instead of as 27 opaque AnalysisExceptions in the gate.
  *
  * Contract style: column names and order are exact; each column accepts a
  * SET of Spark types (the physically-plausible fixture forms — e.g. a
  * timestamp column may arrive as NTZ, instant, or DATE; an int32 key may
  * widen to int64). A type outside the set means a consumer somewhere
  * assumes a representation nobody has audited against the new form.
  */
class FixtureContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // acceptable-type families
  private val intLike: Set[DataType] = Set(IntegerType, LongType)
  private val tsLike: Set[DataType] = Set(TimestampType, TimestampNTZType, DateType, LongType)
  private val strLike: Set[DataType] = Set(StringType)
  private val dblLike: Set[DataType] = Set(DoubleType, FloatType)
  private val vecLike: Set[DataType] =
    Set(ArrayType(FloatType, true), ArrayType(FloatType, false),
      ArrayType(DoubleType, true), ArrayType(DoubleType, false))

  private val contract: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> intLike, "r_name" -> strLike),
    "nation" -> Seq("n_nationkey" -> intLike, "n_name" -> strLike, "n_regionkey" -> intLike),
    "customer" -> Seq("c_custkey" -> intLike, "c_name" -> strLike, "c_nationkey" -> intLike,
      "c_acctbal" -> dblLike, "c_mktsegment" -> strLike),
    "supplier" -> Seq("s_suppkey" -> intLike, "s_name" -> strLike, "s_nationkey" -> intLike,
      "s_acctbal" -> dblLike),
    "part" -> Seq("p_partkey" -> intLike, "p_name" -> strLike, "p_brand" -> strLike,
      "p_type" -> strLike, "p_size" -> intLike, "p_retailprice" -> dblLike),
    "orders" -> Seq("o_orderkey" -> intLike, "o_custkey" -> intLike, "o_orderstatus" -> strLike,
      "o_totalprice" -> dblLike, "o_orderdate" -> tsLike, "o_orderpriority" -> strLike),
    "lineitem" -> Seq("l_orderkey" -> intLike, "l_partkey" -> intLike, "l_suppkey" -> intLike,
      "l_linenumber" -> intLike, "l_quantity" -> dblLike, "l_extendedprice" -> dblLike,
      "l_discount" -> dblLike, "l_tax" -> dblLike, "l_returnflag" -> strLike,
      "l_linestatus" -> strLike, "l_shipdate" -> tsLike),
    "events" -> Seq("event_id" -> intLike, "ts" -> tsLike, "user_id" -> intLike,
      "event_type" -> strLike, "value" -> dblLike, "props" -> strLike),
    "documents" -> Seq("doc_id" -> intLike, "text" -> strLike, "lang" -> strLike,
      "source" -> strLike, "n_chars" -> intLike),
    "embeddings" -> Seq("vec_id" -> intLike, "embedding" -> vecLike, "label" -> intLike))

  /** Where to extend when a column's form drifts outside its family. */
  private val boundary: Map[(String, String), String] = Map(
    ("events", "ts") -> "Tables.normalizeTs (+ streaming/Events reader schema)",
    ("events", "props") -> "queries/ExtrasQueries q49/q124 JSON-path projections",
    ("embeddings", "embedding") -> "llm/Similarity vec casts (cast(\"array<double>\"))",
    ("orders", "o_orderdate") -> "DatetimeQueries NTZ handling",
    ("lineitem", "l_shipdate") -> "DatetimeQueries NTZ handling")

  test("every driver fixture table matches its schema contract") {
    assume(new java.io.File(sfDir).isDirectory, s"fixture dir $sfDir absent")
    val problems = contract.toSeq.sortBy(_._1).flatMap { case (table, want) =>
      val got = spark.read.parquet(s"$sfDir/$table.parquet").schema
      if (got.fields.map(_.name).toSeq != want.map(_._1)) {
        Seq(s"$table: columns ${got.fields.map(_.name).toSeq} != expected ${want.map(_._1)}" +
          " — a renamed/reordered fixture breaks every consumer; re-audit the table's queries")
      } else {
        want.zip(got.fields).collect {
          case ((name, accepted), f) if !accepted.contains(f.dataType) =>
            val hint = boundary.getOrElse((table, name),
              "no adaptive boundary exists yet — add one where the column is first consumed")
            s"$table.$name arrived as ${f.dataType.simpleString}, outside the audited " +
              s"family ${accepted.map(_.simpleString).mkString("{", ",", "}")}; extend: $hint"
        }
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }
}
