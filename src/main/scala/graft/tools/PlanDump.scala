package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `explain("formatted")` for EVERY declared query to
  * `plans/<tag>/<query>_<suffix>.txt` — the per-round optimization evidence
  * (the judge checks plan claims against these files). Mirrors the bench's
  * session config so plan shapes (join strategy, AQE, partition counts)
  * match what the bench actually measures. Run:
  *
  *   sbt "runMain graft.tools.PlanDump r14 before [sfDir] [nameFilter]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("r14")
    val suffix = args.lift(1).getOrElse("before")
    val sfDir = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val nameFilter = args.lift(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)

    // shared artifacts materialize exactly as in the bench warm pass so
    // cached-frame plans (InMemoryTableScan) match the measured shape
    graft.queries.KupoPipelineQueries.buildIndex(spark, sfDir)
    graft.queries.LlmQueries.warm(spark, sfDir)

    val mode = ExplainMode.fromString("formatted")
    // comma-separated name filters: one warm pass serves many dumps
    val filters = nameFilter.map(_.split(",").toSeq.filter(_.nonEmpty))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filters.forall(_.exists(n.contains)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // suffixes ending in "_final" EXECUTE the plan first and dump the
          // finalized adaptive plan — the only artifact where runtime
          // ReusedExchange / AQEShuffleRead decisions are visible (a static
          // explain shows isFinalPlan=false shapes with duplicate subtrees
          // that AQE dedups at runtime)
          val txt =
            if (suffix.endsWith("_final")) {
              val ep = df.queryExecution.executedPlan
              ep.execute().foreach(_ => ())
              ep.toString
            } else df.queryExecution.explainString(mode)
          java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          System.err.println(s"[plans] $name ok (${txt.length} chars)")
        } catch {
          case e: Throwable => System.err.println(s"[plans] $name FAILED: $e")
        }
      }
    spark.stop()
  }
}
