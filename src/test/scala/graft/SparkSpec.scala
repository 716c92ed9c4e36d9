package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Shared test session + fixture builders (FIXTURES.md §1: explicit
  * schemas, explicit validity masks via Option).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def longs(name: String, vs: Seq[Option[Long]]): DataFrame = {
    val schema = StructType(Seq(StructField(name, LongType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(vs.map(v => Row(v.orNull))), schema)
  }

  def doubles(name: String, vs: Seq[Option[Double]]): DataFrame = {
    val schema = StructType(Seq(StructField(name, DoubleType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(vs.map(v => Row(v.orNull))), schema)
  }

  def strings(name: String, vs: Seq[Option[String]]): DataFrame = {
    val schema = StructType(Seq(StructField(name, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(vs.map(v => Row(v.orNull))), schema)
  }

  def twoLongs(n1: String, n2: String, vs: Seq[(Option[Long], Option[Long])]): DataFrame = {
    val schema = StructType(Seq(
      StructField(n1, LongType, nullable = true), StructField(n2, LongType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(vs.map { case (a, b) => Row(a.orNull, b.orNull) }), schema)
  }

  /** Collect a single column as Seq[Option[T]] — value AND mask assertion. */
  def col1[T](df: DataFrame): Seq[Option[T]] =
    df.collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.get(0).asInstanceOf[T]))
}
