package graft

import graft.index.GraftIndex
import graft.model.Pattern
import graft.streaming.StreamingIndexer
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** S6 — Structured Streaming ingest with rollback barriers. */
class StreamingSpec extends SparkSpec {

  private val addr = {
    val onChain = "01" + ("11" * 28) + ("22" * 28)
    graft.codec.Bech32.encode("addr", graft.codec.Hex.decode(onChain).get)
  }

  private def fwd(slot: Long, n: Int) = {
    val txs = (0 until n).map { i =>
      s"""{"id":"${f"$slot%02d$i%02d" * 16}","spends":"inputs","inputs":[],
         |"outputs":[{"address":"$addr","value":{"ada":{"lovelace":${slot * 10 + i}}}}]}"""
        .stripMargin.replaceAll("\n", "")
    }.mkString(",")
    s"""{"jsonrpc":"2.0","method":"nextBlock","result":{"direction":"forward","block":{"id":"${f"$slot%064d"}","slot":$slot,"transactions":[$txs]},"tip":{"slot":999,"id":"${"0" * 64}"}}}"""
  }

  private def rollback(slot: Long) =
    s"""{"jsonrpc":"2.0","method":"nextBlock","result":{"direction":"backward","point":{"slot":$slot,"id":"${f"$slot%064d"}"},"tip":{"slot":999,"id":"${"0" * 64}"}}}"""

  private def writeFile(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

  test("streaming ingest drains files; rollback file is a barrier; restart resumes") {
    val in = tmpDir("graft-stream-in")
    val ix = new GraftIndex(spark, tmpDir("graft-stream-ix"))
    val patterns = Set[Pattern](Pattern.MatchAny(includingBootstrap = true))

    // batch 1: forwards only
    writeFile(in, "000.jsonl", Seq(fwd(10, 2), fwd(20, 1)))
    StreamingIndexer.runAvailableNow(spark, in, ix, patterns)
    assert(ix.table("inputs").count() == 3)
    assert(ix.table("checkpoints").agg(max("slot_no")).head().getLong(0) == 20L)

    // batch 2 (new stream run, same checkpoint): rollback to 10, then replays
    writeFile(in, "001.jsonl", Seq(rollback(10)))
    writeFile(in, "002.jsonl", Seq(fwd(21, 2), fwd(30, 1)))
    StreamingIndexer.runAvailableNow(spark, in, ix, patterns)

    // rows created at slot 20 must be gone; replays at 21/30 present
    val slots = ix.table("inputs").select("created_at")
      .collect().map(_.getLong(0)).sorted
    assert(slots.sameElements(Array(10L, 10L, 21L, 21L, 30L)))
    assert(ix.table("checkpoints").agg(max("slot_no")).head().getLong(0) == 30L)

    // batch 3: already-consumed files are not reprocessed (checkpoint)
    StreamingIndexer.runAvailableNow(spark, in, ix, patterns)
    assert(ix.table("inputs").count() == 5)
  }
}
