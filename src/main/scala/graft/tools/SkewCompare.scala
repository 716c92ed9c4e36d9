package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AQE-skew-join vs explicit salting comparison (the q143 operator's
  * "when to prefer which" record): the TPC-H fixture's keys are uniform,
  * so this synthesizes a hot key — a fraction of lineitem rows remapped
  * onto ONE order key — and times the identical join+aggregate three
  * ways on the same data:
  *
  *   aqe_skew:   plain join, AQE skew-join splitting ON (runtime remedy)
  *   aqe_noskew: plain join, skew splitting OFF (the naive baseline —
  *               one reducer owns the hot key)
  *   salted:     Skew.saltedJoin factor 8 (the explicit-plan remedy)
  *
  * All three must agree on the aggregate (checked). Prints one JSON
  * line for PLANS.md.
  *
  * Usage: runMain graft.tools.SkewCompare <sfDir> [hotTenths] [passes]
  */
object SkewCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val hotTenths = if (args.length > 1) args(1).toInt else 3
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-skew-compare")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // skewed fact: hotTenths/10 of lineitem lands on order key 1
    val li = spark.read.parquet(sfDir + "/lineitem.parquet")
      .select(
        when(pmod(col("l_orderkey"), lit(10)) < hotTenths, lit(1L))
          .otherwise(col("l_orderkey")).as("o_orderkey"),
        col("l_extendedprice"), col("l_discount"))
    val ord = spark.read.parquet(sfDir + "/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))

    def run(name: String, skewJoinOn: Boolean, salted: Boolean): (Double, Seq[(String, Long, Double)]) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoinOn)
      // keep the join a sort-merge so the skew remedy (either kind) is
      // actually exercised — a broadcast of orders sidesteps skew
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val secs = (0 until passes).map { _ =>
        val t0 = System.nanoTime()
        val j = if (salted) graft.ops.Skew.saltedJoin(li, ord, Seq("o_orderkey"), 8)
                else li.join(ord, "o_orderkey")
        val rows = agg(j).orderBy(col("o_orderpriority")).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
      }
      (secs.map(_._1).min, secs.head._2)
    }
    // counts exact; revenue within float-sum reassociation tolerance
    // (different plans sum doubles in different orders)
    def agree(a: Seq[(String, Long, Double)], b: Seq[(String, Long, Double)]): Boolean =
      a.size == b.size && a.zip(b).forall { case ((k1, n1, r1), (k2, n2, r2)) =>
        k1 == k2 && n1 == n2 && math.abs(r1 - r2) <= 1e-9 * math.max(1.0, math.abs(r1))
      }

    val (tNo, rNo) = run("aqe_noskew", skewJoinOn = false, salted = false)
    val (tAqe, rAqe) = run("aqe_skew", skewJoinOn = true, salted = false)
    val (tSalt, rSalt) = run("salted", skewJoinOn = false, salted = true)
    require(agree(rNo, rAqe) && agree(rAqe, rSalt),
      "variants disagree on the aggregate")
    println(s"""{"tool":"skew-compare","sf_dir":"$sfDir","hot_frac":${hotTenths / 10.0},""" +
      s""""aqe_noskew_sec":$tNo,"aqe_skew_sec":$tAqe,"salted_sec":$tSalt}""")
    spark.stop()
  }
}
