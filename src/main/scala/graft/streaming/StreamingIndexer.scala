package graft.streaming

import graft.index.{GraftIndex, Mutations}
import graft.ingest.{BlockReader, Indexer}
import graft.model.Pattern
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** S6 — the Mailbox consumer loop as Structured Streaming.
  *
  * The reference micro-batches blocks through a bounded STM queue and drains
  * it whole per SQLite transaction (/root/reference/src/Kupo/App/Mailbox.hs:
  * 27-83, consumer /root/reference/src/Kupo/App.hs:496-510); rollbacks are
  * intermittent messages that BLOCK further forwards until consumed
  * (Mailbox.hs:64-77) — i.e. a rollback is a barrier: `flushMailbox` never
  * yields forwards and a rollback in the same drain.
  *
  * Here the queue is a file stream of Ogmios-shaped JSONL (BlockReader's
  * wire format) and the drain is `foreachBatch`: one micro-batch = one
  * atomic manifest bump, mirroring the reference's one-transaction-per-drain
  * crash consistency (App.hs:512-577). Rollbacks found in a batch are
  * applied FIRST (net effect of several = the earliest point), then the
  * batch's forward blocks are ingested as post-rollback replays — the same
  * ordering the Mailbox enforces by blocking. Feeders must therefore not
  * write a forward that PRECEDES a rollback into the same file (the file is
  * the batch boundary, like the reference's queue drain).
  *
  * Exactly-once: the file source checkpoint records which files are
  * consumed; `Indexer.ingest` appends are idempotent (PK dedup at
  * read/compaction), so a batch replayed after a crash re-appends the same
  * rows harmlessly — the INSERT OR IGNORE analogue at the stream level. */
object StreamingIndexer {

  /** Process one drained micro-batch: rollback barrier first, then ingest. */
  def processBatch(ix: GraftIndex, raw: DataFrame, patterns: Set[Pattern]): Unit = {
    val env = BlockReader.parseEnvelope(raw).cache()
    try {
      val rollbackPoints = BlockReader.rollbacks(env).collect()
      if (rollbackPoints.nonEmpty) {
        val target = rollbackPoints.map(_.getLong(0)).min
        Mutations.rollbackTo(ix, target)
      }
      val blocks = BlockReader.blocks(env)
      if (!blocks.isEmpty) Indexer.ingest(ix, blocks, patterns)
    } finally env.unpersist()
  }

  /** Start the streaming indexer over a directory of JSONL files.
    * `Trigger.AvailableNow` drains everything pending then stops (backfill /
    * test mode); a processing-time trigger tails the directory (live mode).
    * The checkpoint lives inside the index root: index + stream position
    * move together, like the reference's checkpoint-in-the-same-transaction
    * (App.hs:526-544). */
  def start(spark: SparkSession, inputDir: String, ix: GraftIndex,
            patterns: Set[Pattern],
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .text(inputDir)
      .withColumnRenamed("value", "raw")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(ix, batch, patterns)
      }
      .option("checkpointLocation", s"${ix.root}/_stream_checkpoint")
      .trigger(trigger)
      .start()
  }

  /** Drain everything currently pending and wait for completion. */
  def runAvailableNow(spark: SparkSession, inputDir: String, ix: GraftIndex,
                      patterns: Set[Pattern]): Unit = {
    val q = start(spark, inputDir, ix, patterns)
    q.awaitTermination()
  }
}
