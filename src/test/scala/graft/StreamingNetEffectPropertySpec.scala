package graft

import graft.index.GraftIndex
import graft.model.Pattern
import graft.streaming.StreamingIndexer

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.util.Random

/** Property: applying a micro-batch with StreamingIndexer's net-effect
  * (chain-ordered) semantics produces EXACTLY the state of applying the same
  * envelopes ONE PER BATCH (trivially sequential, the reference's mailbox
  * discipline) — over randomized reorg histories with spends, deep and
  * shallow rollbacks, and rollback-to-origin, split across one or several
  * batch files. */
class StreamingNetEffectPropertySpec extends SparkSpec {

  private val addr = {
    val onChain = "01" + ("11" * 28) + ("22" * 28)
    graft.codec.Bech32.encode("addr", graft.codec.Hex.decode(onChain).get)
  }
  private val patterns = Set[Pattern](Pattern.MatchAny(includingBootstrap = true))

  private def fwdJson(slot: Long, hash: String,
                      txs: Seq[(String, Seq[(String, Int)], Long)]): String = {
    val txJson = txs.map { case (id, inputs, coins) =>
      val ins = inputs.map { case (t, i) =>
        s"""{"transaction":{"id":"$t"},"index":$i}"""
      }.mkString(",")
      s"""{"id":"$id","spends":"inputs","inputs":[$ins],""" +
        s""""outputs":[{"address":"$addr","value":{"ada":{"lovelace":$coins}}}]}"""
    }.mkString(",")
    s"""{"jsonrpc":"2.0","method":"nextBlock","result":{"direction":"forward",""" +
      s""""block":{"id":"$hash","slot":$slot,"transactions":[$txJson]},""" +
      s""""tip":{"slot":999,"id":"${"0" * 64}"}}}"""
  }

  private def rollbackJson(target: Long, hash: String): String =
    if (target < 0)
      s"""{"jsonrpc":"2.0","method":"nextBlock","result":{"direction":"backward",""" +
        s""""point":"origin","tip":{"slot":999,"id":"${"0" * 64}"}}}"""
    else
      s"""{"jsonrpc":"2.0","method":"nextBlock","result":{"direction":"backward",""" +
        s""""point":{"slot":$target,"id":"$hash"},"tip":{"slot":999,"id":"${"0" * 64}"}}}"""

  /** Generate a VALID chain history (spends only reference live utxos at
    * that point; rollback targets are on-chain points or origin). */
  private def genEnvelopes(seed: Int, n: Int): Seq[String] = {
    val rnd = new Random(seed)
    var counter = 0
    def freshId(): String = { counter += 1; f"$counter%064d" }
    // chain state the generator maintains so every envelope is valid
    var chain = List.empty[(Long, String)] // (slot, hash) asc
    var utxo = Map.empty[(String, Int), Long] // ref -> created slot
    var spent = Map.empty[(String, Int), (Long, Long)] // ref -> (created, spent)
    val out = Seq.newBuilder[String]
    (0 until n).foreach { _ =>
      val tip = chain.lastOption.map(_._1).getOrElse(-1L)
      if (chain.nonEmpty && rnd.nextInt(4) == 0) {
        // rollback to a random on-chain point (or origin 1 in 8)
        val (target, hash) =
          if (rnd.nextInt(8) == 0) (-1L, "")
          else chain(rnd.nextInt(chain.length))
        out += rollbackJson(target, hash)
        chain = chain.takeWhile(_._1 <= target)
        utxo = utxo.filter { case (_, created) => created <= target }
        val (undone, kept) = spent.partition { case (_, (_, at)) => at > target }
        spent = kept
        undone.foreach { case (ref, (created, _)) =>
          // restore only refs whose creation itself survived the rollback
          if (created <= target) utxo += ref -> created
        }
      } else {
        val slot = tip + 1 + rnd.nextInt(3)
        val hash = freshId()
        val txs = (0 until 1 + rnd.nextInt(2)).map { _ =>
          val id = freshId()
          val spends =
            if (utxo.nonEmpty && rnd.nextInt(3) == 0) {
              val ref = utxo.keys.toSeq(rnd.nextInt(utxo.size))
              spent += ref -> (utxo(ref), slot); utxo -= ref
              Seq(ref)
            } else Nil
          utxo += (id, 0) -> slot
          (id, spends, 1000L + counter)
        }
        out += fwdJson(slot, hash, txs)
        chain = chain :+ ((slot, hash))
      }
    }
    out.result()
  }

  private def state(ix: GraftIndex) = {
    val rows = ix.inputsWithSpends
      .select("tx_id", "output_index", "created_at", "spent_at")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
    val cps = ix.table("checkpoints").select("slot_no", "header_hash")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    (rows, cps)
  }

  test("memory-stream feed with an explicit seq column matches sequential (seed 31)") {
    // non-file feeds can't be re-read for chain order — the contract is an
    // explicit per-envelope `seq` column, which processOrdered uses directly
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val envelopes = genEnvelopes(31, 30)

    val seqIx = new GraftIndex(spark, tmpDir("graft-neteff-memseq"))
    envelopes.foreach { line =>
      StreamingIndexer.processBatch(seqIx, Seq(line).toDF("raw"), patterns)
    }

    val ms = MemoryStream[(Long, String)]
    ms.addData(envelopes.zipWithIndex.map { case (l, i) => (i.toLong, l) })
    val memIx = new GraftIndex(spark, tmpDir("graft-neteff-memix"))
    val q = ms.toDF.toDF("seq", "raw").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingIndexer.processBatch(memIx, batch, patterns)
      }
      .start()
    q.processAllAvailable(); q.stop()
    assert(state(memIx) == state(seqIx), "memory-stream batch diverged")
  }

  // seed 11 runs by default; 23/47 are HeavyTest amplification (same body,
  // two more random reorg histories — ~45 s of sequential-reference wall each)
  for (seed <- Seq(11, 23, 47))
    test(s"net-effect batch == sequential application (seed $seed)",
        (if (seed == 11) Seq.empty else Seq(HeavyTest)): _*) {
    val envelopes = genEnvelopes(seed, 30)

    // reference: one envelope per batch — trivially sequential
    val seqIx = new GraftIndex(spark, tmpDir(s"graft-neteff-seq-$seed"))
    envelopes.foreach { line =>
      import spark.implicits._
      StreamingIndexer.processBatch(seqIx, Seq(line).toDF("raw"), patterns)
    }

    // ALL envelopes in ONE file = one batch, net-effect path
    val in1 = tmpDir(s"graft-neteff-one-$seed")
    Files.write(Paths.get(in1, "000.jsonl"),
      envelopes.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val oneIx = new GraftIndex(spark, tmpDir(s"graft-neteff-oneix-$seed"))
    StreamingIndexer.runAvailableNow(spark, in1, oneIx, patterns)
    assert(state(oneIx) == state(seqIx), "single-file batch diverged")

    // split across 3 name-ordered files (order must hold across files too)
    val in3 = tmpDir(s"graft-neteff-three-$seed")
    val chunks = envelopes.grouped((envelopes.size + 2) / 3).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      Files.write(Paths.get(in3, f"$i%03d.jsonl"),
        chunk.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    val threeIx = new GraftIndex(spark, tmpDir(s"graft-neteff-threeix-$seed"))
    StreamingIndexer.runAvailableNow(spark, in3, threeIx, patterns)
    assert(state(threeIx) == state(seqIx), "multi-file batch diverged")
  }
}
