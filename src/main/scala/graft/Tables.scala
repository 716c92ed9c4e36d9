package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet star schema (TESTDATA.md).
  *
  * Mirrors the reference's explicit-schema stance (minarrow
  * `src/structs/field_array.rs:110` — every column carries a concrete
  * `ArrowType`, no inference): parquet carries the schema, we never use
  * `inferSchema`, and the only boundary normalization we perform is the
  * nanosecond→microsecond timestamp policy below (minarrow `TimeUnit`
  * normalization, `src/enums/time_units.rs:42-57`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS). Spark's µs timestamps truncate
    * nanos on read exactly as DuckDB does (both floor to µs), so values stay
    * oracle-comparable.
    */
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")

  /** Register all tables as temp views so `spark.sql` mirrors the oracle. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
