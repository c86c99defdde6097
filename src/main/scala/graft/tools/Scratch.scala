package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query dump for local oracle iteration: writes one
  * `SparkEntry.queries` result as parquet plus its declared oracle SQL, so
  * a new query can be DuckDB-compared in seconds instead of re-running the
  * full `check_oracle.py` sweep. Usage:
  * `sbt "runMain graft.tools.Scratch q_name [sfDir] [outDir]"`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/scratch-out"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/$name.sql"),
      graft.SparkEntry.oracleSql.getOrElse(name, ""))
    df.show(20, truncate = false)
    spark.stop()
  }
}
