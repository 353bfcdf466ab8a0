package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Ad-hoc job/stage profiler for one SparkEntry query: counts the Spark
  * jobs, stages, and tasks one execution launches and the wall time of
  * each job — the number that dominates small-scale bench wall for the
  * iterative operators (each driver-side action pays scheduling +
  * materialization latency regardless of data size). Usage:
  *   runMain graft.ProfileJobs <sfDir> <query> [<query> ...]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val aqeOff = args.contains("aqe=off")
    val planLen = args.find(_.startsWith("plan=")).map(_.drop(5)).getOrElse("65536")
    val names = args.drop(1).filterNot(a => a == "aqe=off" || a.startsWith("plan=")).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", (!aqeOff).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", planLen)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach(t => graft.sources.Tables(spark, sfDir, t).count())

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var jobMillis = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStart.put(js.jobId, js.time); jobs += 1
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.getOrDefault(je.jobId, je.time)
        jobMillis += (je.time - t0)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += sc.stageInfo.numTasks
        val si = sc.stageInfo
        val ms = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(-1L)
        if (ms >= 200)
          println(f"  STAGE ${si.stageId}%4d ${si.numTasks}%4d tasks ${ms / 1000.0}%7.3f s  ${si.name.take(90)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm-up (JIT + codegen + page cache), untimed
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      Thread.sleep(500)
      jobs = 0; stages = 0; tasks = 0L; jobMillis = 0L
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(500) // let listener drain
      println(f"JOBS $name%-28s wall=$dt%7.3f s  jobs=$jobs%4d  stages=$stages%4d  tasks=$tasks%6d  jobTime=${jobMillis / 1000.0}%7.3f s")
    }
    spark.stop()
  }
}
