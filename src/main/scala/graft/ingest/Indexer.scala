package graft.ingest

import graft.index.GraftIndex
import graft.model.Pattern
import org.apache.spark.sql.DataFrame

/** Batch ingest driver: one call = one micro-batch = one atomic manifest
  * bump, mirroring the reference's consumer transaction
  * (/root/reference/src/Kupo/App.hs:512-577: insertCheckpoints → insertInputs
  * → insertPolicies → markInputs → insertBinaryData/insertScripts).
  * Appends are idempotent (PK dedup at read/compaction), so re-ingesting an
  * overlapping batch is safe — the INSERT OR IGNORE analogue (SQLite.hs:831-844). */
object Indexer {

  def ingest(ix: GraftIndex, blocks: DataFrame, patterns: Set[Pattern]): Unit = {
    val m = MatchBlock(blocks, patterns)
    // ONE atomic manifest bump for the whole batch (the reference's
    // one-transaction-per-drain); the six segment writes run sequentially —
    // see commitAll's note on why concurrent writes over plans sharing one
    // expression tree are unsafe
    ix.commitAll(appends = Map(
      "checkpoints" -> m.checkpoints,
      "inputs" -> m.produced,
      "policies" -> m.policies,
      "binary_data" -> m.datums,
      "scripts" -> m.scripts,
      "spends" -> m.spends))
  }

  def setPatterns(ix: GraftIndex, patterns: Set[Pattern]): Unit = {
    val spark = ix.spark
    import spark.implicits._
    ix.replace("patterns", patterns.map(_.toText).toSeq.toDF("pattern"))
  }

  def getPatterns(ix: GraftIndex): Set[Pattern] =
    ix.table("patterns").collect().flatMap(r => Pattern.fromText(r.getString(0))).toSet
}
