package graft

import graft.index.GraftIndex
import graft.ingest.Indexer
import graft.model.Pattern
import graft.tools.FixtureChain

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** U7's VACUUM half (reference: post-copy VACUUM
  * /root/reference/src/Kupo/App/Database/SQLite.hs:476-576): dereferenced
  * segment directories must actually leave the disk, bounded by the manifest
  * — while a reader pinned to an older manifest still reads inside the grace
  * window. */
class VacuumSpec extends SparkSpec {

  private val patterns: Set[Pattern] = Set(Pattern.MatchAny(includingBootstrap = true))

  /** Segment dirs on disk for `table` (live + dereferenced garbage). */
  private def onDiskSegments(root: String, table: String): Set[String] = {
    val dir = Paths.get(root, table)
    if (!Files.isDirectory(dir)) Set.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).toSet
      finally s.close()
    }
  }

  test("repeated ingest+compact with zero grace keeps on-disk segments == manifest") {
    val ix = new GraftIndex(spark, tmpDir("graft-vacuum"), vacuumGraceMs = 0L)
    FixtureChain.chain(12).grouped(3).foreach { batch =>
      Indexer.ingest(ix, FixtureChain.toDf(spark, batch), patterns)
      ix.compact() // compact() ends with vacuum(vacuumGraceMs)
    }
    val live = ix.manifest.tables.getOrElse("inputs", Nil).map(_.path.split('/').last).toSet
    val disk = onDiskSegments(ix.root, "inputs")
    assert(disk == live, s"disk=$disk live=$live")
    // compact() rewrites the whole table: exactly one live inputs segment
    assert(live.size == 1)
    // side tables are bounded too
    Seq("checkpoints", "policies", "binary_data", "scripts", "spends").foreach { t =>
      val l = ix.manifest.tables.getOrElse(t, Nil).map(_.path.split('/').last).toSet
      assert(onDiskSegments(ix.root, t) == l, s"table $t leaked")
    }
  }

  test("grace window protects a reader pinned to an old manifest") {
    val ix = new GraftIndex(spark, tmpDir("graft-vacuum-grace")) // default 10 min grace
    Indexer.ingest(ix, FixtureChain.toDf(spark, FixtureChain.chain(6)), patterns)
    val pinned = ix.manifest
    val reader = ix.tableAt("inputs", pinned)
    val before = reader.count()
    assert(before > 0)
    ix.compact() // dereferences the original segments; grace keeps the files
    val oldSegs = pinned.tables("inputs").map(_.path)
    assert(oldSegs.forall(p => Files.exists(Paths.get(ix.root, p))),
      "grace window must keep dereferenced files for pinned readers")
    assert(reader.count() == before) // pinned snapshot still reads
    // grace elapsed (simulated by a zero-grace sweep): files go away,
    // current manifest still reads everything
    val deleted = ix.vacuum(0L)
    assert(deleted >= oldSegs.size)
    assert(oldSegs.forall(p => !Files.exists(Paths.get(ix.root, p))))
    assert(ix.table("inputs").count() == before)
  }

  test("vacuum never touches live segments or the stream checkpoint dir") {
    val ix = new GraftIndex(spark, tmpDir("graft-vacuum-live"), vacuumGraceMs = 0L)
    Indexer.ingest(ix, FixtureChain.toDf(spark, FixtureChain.chain(4)), patterns)
    val ckpt = Paths.get(ix.root, "_stream_checkpoint", "sources")
    Files.createDirectories(ckpt)
    // may sweep empty-batch leftovers (writeSegment writes before it knows
    // the count; M9 then registers nothing) — but never live dirs or the
    // checkpoint, verified below
    ix.vacuum(0L)
    assert(Files.isDirectory(ckpt))
    val live = ix.manifest.tables.values.flatten.map(_.path)
    assert(live.forall(p => Files.exists(Paths.get(ix.root, p))))
  }

  test("compactSpends driver footprint is bucket-ranged, not slot-sized") {
    val ix = new GraftIndex(spark, tmpDir("graft-bucket-ranges"), vacuumGraceMs = 0L)
    // many distinct created_at slots inside ONE bucket, all spent later:
    // the collected footprint must be one merged range, not |slots| entries
    val outs = (0 until 40).map { i =>
      FixtureChain.Blk(10L + i, FixtureChain.hex32(777000 + i), Seq(
        FixtureChain.Tx(FixtureChain.hex32(888000 + i), Nil,
          Seq(FixtureChain.Out(FixtureChain.baseAddr(i % 4, i % 3), i + 1L)))))
    }
    Indexer.ingest(ix, FixtureChain.toDf(spark, outs), patterns)
    val spendAll = FixtureChain.Blk(1000L, FixtureChain.hex32(779000), Seq(
      FixtureChain.Tx(FixtureChain.hex32(889000),
        (0 until 40).map(i => (FixtureChain.hex32(888000 + i), 0)),
        Seq(FixtureChain.Out(FixtureChain.baseAddr(0, 0), 1L)))))
    Indexer.ingest(ix, FixtureChain.toDf(spark, Seq(spendAll)), patterns)
    val ranges = ix.markedBucketRanges()
    val buckets = ix.table("inputs")
      .select("created_bucket").distinct().count()
    assert(ranges.length <= buckets, s"${ranges.length} ranges for $buckets buckets")
    assert(ranges.length < 40, "footprint must not scale with marked slots")
    // and the fold itself stays correct
    ix.compactSpends()
    assert(ix.table("spends").count() == 0)
    val spent = ix.inputsWithSpends.where(org.apache.spark.sql.functions.col("spent_at") === 1000L).count()
    assert(spent == 40L)
  }
}
