package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-JOB wall-clock profile of one declared query (guide §1: find where
  * the time goes before touching anything). Registers a SparkListener,
  * runs the named query via the noop sink exactly as Bench does, and
  * prints every Spark job's duration, stage/task counts and call site —
  * the job-granular view the (disabled) UI would give.
  *
  * Usage: runMain graft.tools.JobProfile <sfDir> <queryName> [passes]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("job-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class J(id: Int, desc: String, site: String, start: Long,
      var end: Long = 0L, var nStages: Int = 0, var nTasks: Int = 0)
    val jobs = mutable.ArrayBuffer.empty[J]
    val byId = mutable.HashMap.empty[Int, J]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        val desc = Option(e.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")
        val site = Option(e.properties).map(_.getProperty("callSite.short", "")).getOrElse("")
        val j = J(e.jobId, desc, site, e.time,
          nStages = e.stageInfos.size, nTasks = e.stageInfos.map(_.numTasks).sum)
        jobs += j; byId(e.jobId) = j
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        byId.get(e.jobId).foreach(_.end = e.time)
      }
    })

    val q = graft.SparkEntry.allDefs.find(_.name == qname)
      .getOrElse(sys.error(s"unknown query: $qname"))
    (1 to passes).foreach { p =>
      jobs.clear(); byId.clear()
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain the last job-end events
      println(f"== pass $p: $qname wall ${wall}%.2f s, ${jobs.size} jobs, " +
        f"job-sum ${jobs.map(j => (j.end - j.start) / 1e3).sum}%.2f s ==")
      if (p == passes) jobs.foreach { j =>
        println(f"  job ${j.id}%3d ${(j.end - j.start) / 1e3}%6.2f s  " +
          f"stages=${j.nStages}%2d tasks=${j.nTasks}%4d  ${j.site}%-40s ${j.desc.take(80)}")
      }
    }
    spark.stop()
  }
}
