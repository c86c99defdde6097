package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable operator: a Spark pipeline over the testdata tables
  * plus (when SQL-expressible) the equivalent DuckDB oracle SQL. Column names
  * and types are aligned on both sides; every query has a total ORDER BY so
  * results are deterministic row-for-row. */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as i64;
    // the oracle side mirrors with epoch_ns(ts)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
