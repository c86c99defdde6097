package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Iteration harness for optimization work: time a SUBSET of the declared
  * queries with the bench's exact methodology (shared-artifact warm, one
  * untimed warm pass per query, then best-of-3 noop-sink executions) without
  * paying for the full 147-query sweep. Substring filters select queries:
  *
  *   sbt "runMain graft.tools.QuickBench q_cms q_hll q_heavy"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  * Prints one line per query: name, best, all runs — plus the per-best-run
  * execution profile a UI would show (the spark_optimization_guide §1/§7
  * evidence, collected in-band since the bench runs with the UI off):
  * jobs launched, stages, summed task time, shuffle bytes written, input
  * bytes read. Job/stage counts are the local-mode "job floor" tell: a
  * 1-second query running 14 jobs is paying ~70ms of scheduling floor per
  * job before any data work. */
object QuickBench {

  /** Accumulates scheduler-side metrics between reset() calls. */
  final class Profile extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val input = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        taskMs.addAndGet(m.executorRunTime)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        input.addAndGet(m.inputMetrics.bytesRead)
      }
      ()
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); taskMs.set(0); shuffleWrite.set(0); input.set(0) }
    def line: String = f"jobs=${jobs.get}%3d stages=${stages.get}%3d " +
      f"taskSec=${taskMs.get / 1e3}%7.2f shufMB=${shuffleWrite.get / 1e6}%8.2f inMB=${input.get / 1e6}%8.2f"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val prof = new Profile
    spark.sparkContext.addSparkListener(prof)

    val picked = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.contains) }
    picked.foreach { case (name, fn) =>
      try {
        spark.sparkContext.setJobDescription(name)
        val warmDf = fn(spark, sfDir)
        warmDf.write.format("noop").mode("overwrite").save() // warm
        // SPARK_GRAFT_QB_PLAN=1: print the POST-EXECUTION adaptive plan —
        // the only place runtime ReusedExchange / AQEShuffleRead show up
        // (explain() before execution prints isFinalPlan=false shapes)
        if (sys.env.contains("SPARK_GRAFT_QB_PLAN")) {
          // drive THIS QueryExecution to completion so AQE finalizes and
          // runtime ReusedExchange / AQEShuffleRead nodes are visible
          val ep = warmDf.queryExecution.executedPlan
          ep.execute().foreach(_ => ())
          println(s"=== $name final plan ===\n" + ep.toString)
        }
        var perRun = ""
        val runs = (0 until 3).map { i =>
          // listener events are async; a short quiesce keeps run 0's window clean
          if (i == 0) { Thread.sleep(250); prof.reset() }
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          // profile covers run 0 only (fresh listener window): per-run job
          // structure is identical across runs, only timings wobble
          if (i == 0) { Thread.sleep(250); perRun = prof.line }
          dt
        }
        spark.sparkContext.setJobDescription(null)
        println(f"$name%-28s best=${runs.min}%.3f  runs=${runs.map(t => f"$t%.3f").mkString(",")}  $perRun")
      } catch { case e: Throwable => println(s"$name FAILED: $e") }
    }
    spark.stop()
  }
}
