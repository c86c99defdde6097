package graft

import graft.queries.{KupoPipelineQueries, LlmQueries, QueryDef, RelationalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory (SURVEY.md §2) is covered three ways:
  *  - RelationalQueries: each kupo operator embodied as a generic relational
  *    pipeline over the driver tables (FIXTURES.md §B mapping);
  *  - KupoPipelineQueries: the real GraftIndex + FoldInputs engine driven
  *    end-to-end over a deterministically derived index, oracle-mirrored as
  *    DuckDB CTEs;
  *  - LlmQueries: the training-data operators (dedup, LSH, simhash,
  *    similarity search, text analysis).
  * Domain semantics (pattern algebra, reorg, GC) are additionally covered by
  * the ScalaTest model-based suite on kupo-shaped fixtures. */
object SparkEntry {

  private val all: Seq[QueryDef] =
    RelationalQueries.defs ++ KupoPipelineQueries.defs ++ LlmQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val q = all.find(_.name == "q_kupo_fold_inputs").get
    q.fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
