package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the data-mixing step of a training
  * pipeline: each stratum (source, language, quality band …) keeps a fixed
  * fraction of its documents, chosen by a salted content-independent hash so
  * the selection is reproducible run-to-run, engine-to-engine, and stable
  * under corpus growth (a doc's fate never depends on other docs).
  *
  * The hash bucket is the first hex byte of md5(salt ‖ id) COMPARED AS A
  * STRING against a two-hex-digit threshold — string comparison on
  * lowercase hex is byte-lexicographic in every engine, so the predicate
  * needs no base conversion and mirrors into any SQL oracle verbatim.
  * Granularity is 1/256; thresholds: "40" ≈ 25%, "80" ≈ 50%, "c0" ≈ 75%.
  *
  * Scale shape: a pure map over the corpus (one md5 + one comparison per
  * row, no shuffle); the mix REPORT is one map-side-combined aggregation
  * keyed by the stratum. */
object Sampling {

  /** Two-hex-char bucket of a salted id: uniform over 256 values. */
  def hashBucket(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 2)

  /** Keep rows whose bucket falls under the per-row threshold (a two-digit
    * lowercase-hex string column, e.g. from a stratum → rate lookup). */
  def stratifiedSample(docs: DataFrame, threshold: Column,
                       idCol: String = "doc_id", salt: String = "mix"): DataFrame =
    docs.where(hashBucket(col(idCol), salt) < threshold)

  /** Mix report: per stratum, total docs and how many the sampling keeps —
    * exact integers for hash-gating; the realized rate is downstream
    * arithmetic. */
  def mixReport(docs: DataFrame, stratumCol: String, threshold: Column,
                idCol: String = "doc_id", salt: String = "mix"): DataFrame =
    docs.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"),
        count(when(hashBucket(col(idCol), salt) < threshold, 1)).as("n_sampled"))

  /** Sequence packing, concatenate-and-chunk style (the GPT-pretraining
    * layout): within each stream (source shard), documents concatenate in a
    * fixed deterministic order and the token stream is cut every `capacity`
    * tokens; each doc reports its start offset in the stream and the chunk
    * (`bin`) it starts in. One running-sum window per stream — the shuffle
    * partitions by stream, then all work is partition-local, the standard
    * 100 TB shape (streams are the parallel unit, like sessionization's
    * users). Exact integers throughout. */
  def packSequences(docs: DataFrame, capacity: Int,
                    streamCol: String = "source",
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), col(streamCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", (col("start_offset") / capacity).cast("long"))
  }
}
