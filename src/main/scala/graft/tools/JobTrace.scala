package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job-level attribution for one query execution INCLUDING the eager work
  * inside the query-builder fn (the mutation queries run appends/commits at
  * fn-call time, which PlanProbe's scan-only timer misses). Prints every
  * Spark job with its wall duration and call site, so the per-job floor of
  * a 20-job query can be attributed line by line.
  *
  *   sbt "runMain graft.tools.JobTrace q_kupo_append_backfill [sfDir]"
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.queries.KupoPipelineQueries.buildIndex(spark, sfDir)
    graft.queries.LlmQueries.warm(spark, sfDir)

    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm

    case class J(id: Int, start: Long, var end: Long = 0L, var site: String = "",
                 var stages: Int = 0, var taskMs: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val j = J(js.jobId, js.time)
        j.site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        jobs.put(js.jobId, j)
        js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        Option(stageToJob.get(sc.stageInfo.stageId))
          .flatMap(jid => Option(jobs.get(jid))).foreach { j =>
            j.stages += 1
            if (sc.stageInfo.taskMetrics != null)
              j.taskMs += sc.stageInfo.taskMetrics.executorRunTime
          }
      }
    })

    Thread.sleep(300)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)

    import scala.jdk.CollectionConverters._
    val js = jobs.values.asScala.toSeq.sortBy(_.start)
    println(f"==== $name wall=$wall%.3f s, ${js.size} jobs ====")
    val base = js.headOption.map(_.start).getOrElse(0L)
    js.foreach { j =>
      println(f"  job ${j.id}%4d t+${(j.start - base) / 1e3}%7.3f dur=${(j.end - j.start) / 1e3}%6.3f s stages=${j.stages}%2d taskSec=${j.taskMs / 1e3}%7.3f  ${j.site}")
    }
    spark.stop()
  }
}
