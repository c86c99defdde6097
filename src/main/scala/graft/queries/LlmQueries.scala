package graft.queries

import org.apache.spark.sql.SparkSession

/** Training-data pipeline operators over `documents` and `embeddings`,
  * split by domain: dedup ([[LlmDedupQueries]]), similarity search
  * ([[LlmAnnQueries]], [[LlmIvfPqQueries]]), text analysis
  * ([[LlmTextQueries]]), sampling/mix design ([[LlmSamplingQueries]]),
  * mergeable sketches ([[LlmSketchQueries]]), and event streams
  * ([[LlmEventQueries]]); shared index artifacts live in
  * [[LlmArtifacts]]. This object is the stable aggregation point
  * SparkEntry and Bench consume. */
object LlmQueries {

  /** Materialize the shared index artifacts (see [[LlmArtifacts.warm]]). */
  def warm(s: SparkSession, d: String): Unit = LlmArtifacts.warm(s, d)

  val defs: Seq[QueryDef] =
    LlmDedupQueries.defs ++ LlmAnnQueries.defs ++ LlmIvfPqQueries.defs ++
      LlmTextQueries.defs ++ LlmSamplingQueries.defs ++
      LlmSketchQueries.defs ++ LlmEventQueries.defs
}
