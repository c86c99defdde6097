package graft.tools

// scratch verification driver — drives the public API end-to-end
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.index.{GraftIndex, Mutations}
    import graft.ingest.Indexer
    import graft.model.Pattern
    import graft.query.{Api, FoldInputs}

    val root = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val ix = new GraftIndex(spark, root)

    // ingest 3 micro-batches of a generated 12-block chain
    val blocks = FixtureChain.chain(12)
    blocks.grouped(4).foreach { b =>
      Indexer.ingest(ix, FixtureChain.toDf(spark, b), Set(Pattern.MatchAny(false)))
    }
    println(s"== index at $root, manifest version ${ix.manifest.version}")

    println("== flagship: GET /matches/*/* unspent, desc ==")
    FoldInputs(ix, Api.MatchesQuery("*/*", status = Api.StatusFlag.OnlyUnspent)).show(5, false)

    println("== delegation pattern + created range [30,70] asc ==")
    val cred = FixtureChain.baseAddr(0, 0).substring(2, 58)
    FoldInputs(ix, Api.MatchesQuery(s"*/$cred",
      range = Api.SlotRange(Api.RangeField.CreatedAt, Some(30L), Some(70L)),
      order = Api.SortDirection.Asc)).show(5, false)

    println("== counts: " + FoldInputs.countInputs(ix, "*/*") +
      " inputs, " + FoldInputs.countPolicies(ix, "*/*") + " policies")
    println("== max checkpoint: " + FoldInputs.maxCheckpoint(ix))
    println("== log-spaced checkpoints: " +
      FoldInputs.listCheckpointsDesc(ix).collect().map(_.getLong(0)).mkString(","))

    println("== rollback to slot 60 ==")
    println("   new max: " + Mutations.rollbackTo(ix, 60L))
    println("   rows after rollback: " + FoldInputs.countInputs(ix, "*"))
    println("   spent>60 rows: " + ix.inputsWithSpends
      .where(org.apache.spark.sql.functions.col("spent_at") > 60).count())

    // probe: invalid pattern text
    try FoldInputs(ix, Api.MatchesQuery("zz/not-a-pattern"))
    catch { case e: IllegalArgumentException => println("== probe invalid pattern -> " + e.getMessage) }
    // probe: metadata pattern rejected at query time
    try FoldInputs(ix, Api.MatchesQuery("{674}"))
    catch { case e: IllegalArgumentException => println("== probe metadata pattern -> " + e.getMessage) }
    // probe: empty range
    val n = FoldInputs(ix, Api.MatchesQuery("*",
      range = Api.SlotRange(Api.RangeField.CreatedAt, Some(9999L), None))).count()
    println(s"== probe empty-range -> $n rows")

    spark.stop()
  }
}
