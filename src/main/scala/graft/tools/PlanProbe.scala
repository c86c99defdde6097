package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: time + explain named SparkEntry queries against a testdata dir.
  * Usage: runMain graft.tools.PlanProbe <sfDir> <query>[,<query>...] [--explain] */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq else Nil
    val explain = args.contains("--explain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench
    SparkEntry.queries.get("q_r1_count")
      .foreach(fn => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    graft.queries.KupoPipelineQueries.buildIndex(spark, sfDir)
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        stages += ((si.stageId, si.name.linesIterator.next(),
          si.taskMetrics.executorRunTime, si.numTasks))
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      if (explain) { println(s"==== $name plan ===="); df.explain("formatted") }
      stages.clear()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"==== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (args.contains("--stages")) {
        Thread.sleep(500)
        stages.sortBy(-_._3).take(12).foreach { case (id, nm, rt, nt) =>
          println(f"  stage $id%4d runTime=${rt / 1000.0}%8.2fs tasks=$nt%3d  $nm")
        }
      }
    }
    spark.stop()
  }
}
