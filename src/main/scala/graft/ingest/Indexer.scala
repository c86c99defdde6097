package graft.ingest

import graft.index.{GraftIndex, Mutations}
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
    ix.append("checkpoints", m.checkpoints)
    ix.append("inputs", m.produced)
    ix.append("policies", m.policies)
    ix.append("binary_data", m.datums)
    ix.append("scripts", m.scripts)
    Mutations.markInputs(ix, m.spends)
  }

  def setPatterns(ix: GraftIndex, patterns: Set[Pattern]): Unit = {
    val spark = ix.spark
    import spark.implicits._
    ix.replace("patterns", patterns.map(_.toText).toSeq.toDF("pattern"))
  }

  def getPatterns(ix: GraftIndex): Set[Pattern] =
    ix.table("patterns").collect().flatMap(r => Pattern.fromText(r.getString(0))).toSet
}
