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
    // events.ts has shipped as TIMESTAMP(NANOS) parquet in some testdata
    // generations (Spark can only read that as i64 via the legacy conf) and
    // TIMESTAMP(MICROS) in others (read as a real timestamp). Normalize to
    // ONE downstream schema — epoch nanos as long — so every ts-arithmetic
    // query is generation-independent; the oracle side's epoch_ns(ts) is
    // unit-independent the same way.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (df.schema.exists(f => f.name == "ts" && f.dataType.typeName.startsWith("timestamp")))
      // session tz is UTC in every entry point, so NTZ→LTZ is the identity
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "unix_micros(cast(ts as timestamp)) * 1000"))
    else df
  }
}
