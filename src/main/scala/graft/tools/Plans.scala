package graft.tools

import graft.queries.KupoPipelineQueries
import graft.query.{Api, FoldInputs}
import org.apache.spark.sql.SparkSession

/** Physical-plan inspection for the flagship queries: prints
  * `explain("formatted")` so pushdown (PushedFilters), broadcast joins, and
  * WholeStageCodegen spans can be reviewed per round. Run:
  * `sbt "runMain graft.tools.Plans [sfDir]"`. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ix = KupoPipelineQueries.buildIndex(spark, sfDir)
    val cred7 = "0" * 55 + "7"

    println("==== flagship foldInputs (delegation + range + unspent, desc) ====")
    FoldInputs(ix, Api.MatchesQuery(
      s"*/$cred7",
      range = Api.SlotRange(Api.RangeField.CreatedAt, Some(100L), Some(3000L)),
      status = Api.StatusFlag.OnlyUnspent,
      order = Api.SortDirection.Desc)).explain("formatted")

    println("==== resolve_hashes (two extra broadcast left joins) ====")
    FoldInputs(ix, Api.MatchesQuery("*", resolveHashes = true)).explain("formatted")

    println("==== policy pattern (map-key membership pushdown shape) ====")
    FoldInputs(ix, Api.MatchesQuery(s"${"0" * 55 + "2"}.*")).explain("formatted")

    // the LLM-operator flagships: broadcast-only ANN shapes, the k-NN join
    // triples shuffle, and the hierarchical packing prefix sum
    Seq("q_knn_join", "q_ann_ivfpq", "q_ann_ivfpq_batch",
        "q_pack_sequences", "q_length_quantiles").foreach { name =>
      println(s"==== $name ====")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }

    spark.stop()
  }
}
