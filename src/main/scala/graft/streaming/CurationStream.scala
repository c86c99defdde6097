package graft.streaming

import graft.llm.{Dedup, Similarity, Sketches, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The END-TO-END streaming curation pipeline — every incremental piece
  * the LLM family ships, composed under ONE `foreachBatch`:
  *
  *   batch → quality gates (decontamination + frozen classifier)
  *         → near-dup vs the persisted MinHash signature index
  *           (cross-set banding) and within the batch
  *         → semantic near-dup vs the persisted vector index
  *           (incremental within-cell cosine) and within the batch
  *         → append: survivors to the curated corpus; probe artifacts
  *           (signatures + cell-assigned vectors) for ALL gate-passing
  *           docs; IVF-PQ codes to the cell-partitioned ANN index; and
  *           mergeable sketch registers (HLL distinct tokens, quantile
  *           doc lengths) as corpus telemetry, folded on demand by
  *           [[corpusStats]].
  *
  * NET-EFFECT CONTRACT (the StreamingIndexer discipline, property-tested
  * in StreamingSpec): processing a corpus batch-by-batch — under ANY
  * batch split, in id order — produces EXACTLY the survivors of
  * [[curateReference]] run once over the concatenated input. Three
  * design choices make that hold:
  *
  *   - Gates run FIRST and are text-pure (broadcast probes + frozen
  *     model), so their verdicts are independent of batching; exact-dup
  *     pre-filters (e.g. [[EventStreams.dedupStream]] upstream of this
  *     pipeline) commute with them for the same reason.
  *   - The dup rule is "drop a doc iff it matches ANY earlier
  *     gate-passing doc" — pairwise against smaller ids, never
  *     connected-components (whose survivor sets depend on seeing the
  *     whole graph at once).
  *   - Probe artifacts persist for ALL gate-passing docs, INCLUDING
  *     dropped duplicates: a chain a~b, b~c (a≁c) must drop c in every
  *     split — if b's signature vanished with b, a later batch holding c
  *     would keep it. Only the curated corpus is survivors-only.
  *
  * Scale shape per micro-batch: gates are broadcast probes over the
  * batch; the signature probe joins batch bands against the stored band
  * keys (O(batch + matched buckets), never a corpus self-join); the
  * semantic probe equi-joins on the coarse cell; every append is
  * map-only ([[Similarity.ivfPqAppend]]); no stage touches the driver.
  * Production additionally verifies LSH candidates with
  * [[Dedup.setJaccardOnPairs]] before dropping — candidates-only here
  * keeps the reference equality exact. */
object CurationStream {

  /** The frozen per-deployment artifacts every batch probes against. */
  final case class CurationArtifacts(
      benchGrams: DataFrame,  // (gram)-distinct eval-set shingles (broadcast)
      classifier: DataFrame,  // frozen (b, w_bits) model
      centroids: DataFrame,   // IVF coarse quantizer (centroid_id, centroid)
      codebook: DataFrame,    // residual PQ codebook (sub, code_id, cw)
      m: Int, subDim: Int,    // PQ geometry
      bands: Int, rowsPerBand: Int, shingle: Int,
      semanticTau: Double,
      // candidate FLOOR for the heavy-hitters telemetry: each batch records
      // its exact hhPhi-frequent survivor tokens; [[corpusHeavyHitters]]
      // may then be probed at any phi >= hhPhi (the pigeonhole guarantee
      // needs the recorded floor at or below the probe)
      hhPhi: Double = 0.01)

  /** Sink directories of the incremental pipeline. */
  final case class CurationSinks(
      corpusDir: String, // curated survivor rows (append)
      sigDir: String,    // MinHash signatures of ALL gate-passing docs
      vecDir: String,    // cell-assigned vectors of ALL gate-passing docs
      idxDir: String,    // IVF-PQ codes (cell-partitioned, ivfPqAppend)
      statsDir: String)  // mergeable sketch registers (corpus telemetry)

  /** Read a persisted artifact dir, or an empty frame if nothing has been
    * written yet. Existence goes through the Hadoop FileSystem resolved
    * FROM the path (not java.nio, which silently answers "missing" for
    * every non-local scheme — hdfs://, s3a://, ... — and would disable
    * cross-batch dedup without a trace on exactly the deployments that
    * need it). A dir that exists but holds no data files yet (a batch
    * with zero gate-passing docs still writes its marker tree) reads as
    * empty too.
    *
    * Only partitions of batches STRICTLY EARLIER than the probing batch
    * are visible (partition-pruned, so later/own subtrees are never even
    * listed). This is what makes a replay correct, not just clean: after
    * a mid-batch failure the batch's own half-persisted signatures are
    * already in the index, and an unfiltered probe would match every doc
    * against itself and drop the entire batch. Filtering to `batch_id <
    * id` makes the probe read "the index as of all earlier batches" — the
    * same frame the first attempt saw — so retry output is bit-identical.
    * The bookkeeping column is dropped after the filter. */
  private def readOrEmpty(spark: SparkSession, dir: String,
                          like: DataFrame, beforeBatch: Long): DataFrame = {
    // LocalRelation, not an empty RDD: the first-batch probe joins this
    // frame, and an RDD-backed empty reports defaultSizeInBytes — the static
    // planner would shuffle the WHOLE batch against a provably-empty side
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), like.schema)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return empty
    // only schema-inference failure (a dir holding marker trees but no data
    // files yet) reads as empty; any OTHER shape must fail LOUDLY — in
    // particular a pre-batch_id flat layout from an older deployment, which
    // a blanket catch would silently treat as an empty index, re-admitting
    // every historical near-duplicate and then corrupting the dir with a
    // mixed flat+partitioned layout
    val raw =
      try Some(spark.read.parquet(dir))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(_.startsWith("UNABLE_TO_INFER_SCHEMA")) =>
          None
      }
    raw match {
      case None => empty
      case Some(df) if !df.columns.contains("batch_id") =>
        throw new IllegalStateException(
          s"curation sink $dir has no batch_id partition layout — data from " +
            "a pre-idempotent deployment must be migrated (rewrite it under " +
            "a batch_id=<n> subtree below the next batch id) before resuming")
      case Some(df) => df.where(col("batch_id") < beforeBatch).drop("batch_id")
    }
  }

  /** The per-doc QUALITY GATES — text-pure, batching-independent:
    * benchmark decontamination (any contaminated shingle drops the doc)
    * and the frozen classifier (docs it scores negative — or cannot
    * score, having no tokens — drop). */
  private def gate(batch: DataFrame, art: CurationArtifacts): DataFrame = {
    val contaminated = Dedup.benchmarkOverlap(
        Dedup.charGrams(batch, art.shingle), art.benchGrams)
      .where(col("n_contaminated") > 0).select("doc_id")
    val positive = TextAnalysis.applyTextClassifier(batch, art.classifier)
      .where(col("pred_pos") === 1).select("doc_id")
    batch.join(contaminated, Seq("doc_id"), "left_anti")
      .join(positive, Seq("doc_id"), "left_semi")
  }

  /** ONE micro-batch: gate → dedup vs index + append. Returns the
    * survivor frame it appended (already materialized), for callers that
    * chain further work.
    *
    * IDEMPOTENCE: `foreachBatch` is at-least-once — a mid-batch failure
    * replays the whole batch, and five independent appends would then
    * double-land whatever committed before the crash (duplicate corpus
    * rows, telemetry diverging from the stored corpus, every batch doc
    * matching its own half-persisted signature). Every write therefore
    * targets the batch's OWN `batch_id=<id>` partition subtree in
    * OVERWRITE mode: Structured Streaming replays a batch under the same
    * id, so a retry deletes exactly the failed attempt's partial output
    * and nothing else — the standard exactly-once foreachBatch recipe.
    * Callers outside streaming must pass batchIds that are MONOTONICALLY
    * INCREASING per logical batch, like the engine's: the index probes
    * read only strictly-earlier partitions (see [[readOrEmpty]]), and
    * reusing an id overwrites that batch — which is the point. */
  def curateBatch(batch: DataFrame, art: CurationArtifacts,
                  sinks: CurationSinks, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val filtered = gate(batch, art).localCheckpoint(true)

    // near-dup: batch signatures vs the persisted index (cross-set
    // banding — the index never self-pairs), plus within-batch pairs;
    // exact duplicates agree on every band, so one mechanism covers both
    val sigs = Dedup.minhashFromGrams(Dedup.charGrams(filtered, art.shingle))
      .localCheckpoint(true)
    val indexSigs = readOrEmpty(spark, sinks.sigDir, sigs, batchId)
    val dupText = Dedup.crossSetCandidates(indexSigs, sigs, art.bands, art.rowsPerBand)
      .select(col("batch_doc").as("doc_id"))
      .unionByName(Dedup.lshCandidatePairs(sigs, art.bands, art.rowsPerBand)
        .select(col("doc_b").as("doc_id")))

    // semantic near-dup: within-cell cosine vs the persisted vector
    // sidecar (cells from the index's own coarse quantizer), plus
    // within-batch pairs
    val assigned = Similarity.assignCells(
        filtered.select(col("doc_id").as("vec_id"), col("embedding")),
        art.centroids, metric = "l2")
      .localCheckpoint(true)
    val indexVecs = readOrEmpty(spark, sinks.vecDir, assigned, batchId)
    val dupSem = Dedup.incrementalSemanticPairs(indexVecs, assigned, art.semanticTau)
      .select(col("batch_id").as("doc_id"))
      .unionByName(Dedup.semanticPairs(assigned, art.semanticTau)
        .select(col("doc_b").as("doc_id")))

    val survivors = filtered
      .join(dupText.unionByName(dupSem).distinct(), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

    // appends: survivors to the corpus; probe artifacts for ALL
    // gate-passing docs (the chain rule above); codes to the ANN index;
    // sketch registers as CORPUS TELEMETRY — HLL (distinct tokens),
    // quantile (doc lengths): both are LINEAR/MAX-mergeable artifacts, so
    // per-batch register appends reduce to exactly the whole-corpus
    // sketch at read time ([[corpusStats]]) — no batch ever re-reads the
    // corpus to keep running stats current. Each write lands in the
    // batch's own batch_id subtree in overwrite mode (see scaladoc):
    // "append to the artifact" = "create this batch's partition".
    val bdir = s"/batch_id=$batchId"
    survivors.write.mode("overwrite").parquet(sinks.corpusDir + bdir)
    sigs.write.mode("overwrite").parquet(sinks.sigDir + bdir)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(sinks.vecDir + bdir)
    // `assigned` is exactly ivfPqAppend's internal assignCells result (and
    // already checkpointed) — encode it directly rather than re-assigning
    Similarity.ivfPqEncode(assigned, art.centroids, art.codebook, art.m, art.subDim)
      .write.mode("overwrite").partitionBy("cell").parquet(sinks.idxDir + bdir)
    val survToks = survivors.select(lit("corpus").as("scope"),
      explode(filter(split(col("text"), " "), t => t =!= "")).as("token"))
    Sketches.hllRegisters(survToks, Seq("scope"), "token")
      .write.mode("overwrite").parquet(sinks.statsDir + "/hll" + bdir)
    Sketches.quantileRegisters(
        survivors.select(lit("corpus").as("scope"),
          length(col("text")).cast("long").as("v")),
        Seq("scope"), "v")
      .write.mode("overwrite").parquet(sinks.statsDir + "/qlen" + bdir)
    // heavy-hitters telemetry, two mergeable legs: CMS token registers
    // (counter-sum merge) and this batch's EXACT hhPhi-frequent survivor
    // tokens — by pigeonhole a corpus-phi-heavy token (phi >= hhPhi) is
    // hhPhi-heavy in at least one batch, so the candidate union misses
    // none; [[corpusHeavyHitters]] then decides from registers alone
    Sketches.cmsRegisters(survToks, Seq("scope"), "token")
      .write.mode("overwrite").parquet(sinks.statsDir + "/cms" + bdir)
    Sketches.frequentCandidates(
        survToks.withColumn("shard", lit(batchId)),
        Seq("scope"), "token", "shard", art.hhPhi)
      .withColumn("sk_phi", lit(art.hhPhi))
      .write.mode("overwrite").parquet(sinks.statsDir + "/hhcand" + bdir)
    survivors
  }

  /** Corpus telemetry from the per-batch sketch appends: fold every
    * batch's registers down (bucket-wise max for HLL, counter-wise sum
    * for the length quantiles — the sketches' own merge laws, so the
    * result EQUALS sketching the concatenated survivors) and estimate.
    * Returns (distinct-token estimate row, doc-length quantile bounds). */
  def corpusStats(spark: SparkSession, sinks: CurationSinks,
                  qs: Seq[Double] = Seq(0.5, 0.9)): (DataFrame, DataFrame) = {
    // n-way register folds through the sketch family's ONE shared
    // fold/guard shape ([[Sketches.foldRegisters]]): the per-batch appends
    // reduce by each sketch's own merge law, and a mixed-parameter append
    // fails loudly per colliding group instead of blending
    val hll = Sketches.foldRegisters(spark.read.parquet(sinks.statsDir + "/hll"),
      Seq("scope"), Seq("bucket"), Some("m_rho" -> max), Seq("sk_p"), "corpusStats")
    val qlen = Sketches.foldRegisters(spark.read.parquet(sinks.statsDir + "/qlen"),
      Seq("scope"), Seq("qb", "sub"), Some("cnt" -> sum), Seq("sk_s"), "corpusStats")
    (Sketches.hllEstimate(hll, Seq("scope")),
      Sketches.quantileEstimate(qlen, Seq("scope"), qs))
  }

  /** Corpus-level φ-heavy survivor tokens FROM TELEMETRY ALONE — the
    * per-batch CMS registers fold by counter-wise sum (the linear-sketch
    * merge law: exactly the sketch of all survivors ever appended) and the
    * per-batch candidate union is probed against them
    * ([[graft.llm.Sketches.cmsHeavyHitters]]); the curated corpus itself
    * is never re-read. Both guarantee legs are one-sided in the safe
    * direction — no true φ-heavy token is missed; over-counts can admit
    * false positives bounded by the sketch's ε·N.
    *
    * `phi` must be at or above the pipeline's recorded candidate floor
    * (CurationArtifacts.hhPhi) or the pigeonhole guarantee breaks —
    * guarded in-plan via the sk_phi column the appends carry. */
  def corpusHeavyHitters(spark: SparkSession, sinks: CurationSinks,
                         phi: Double): DataFrame = {
    val regs = Sketches.foldRegisters(spark.read.parquet(sinks.statsDir + "/cms"),
      Seq("scope"), Seq("row", "col"), Some("cnt" -> sum), Seq("sk_d", "sk_w"),
      "corpusHeavyHitters")
    // the floor guard anchors on the token column itself (a value the plan
    // keeps) so column pruning can never optimize the raise_error away
    val cand = spark.read.parquet(sinks.statsDir + "/hhcand")
      .select(col("scope"),
        when(col("sk_phi") <= phi, col("token"))
          .otherwise(raise_error(lit(
            s"corpusHeavyHitters: probe phi=$phi is below a batch's recorded" +
              " candidate floor — true hitters could be missing"))).as("token"))
      .distinct()
    graft.llm.Sketches.cmsHeavyHitters(regs, cand, Seq("scope"), "token", phi)
  }

  /** TELESCOPING SINK COMPACTION — the maintenance job that stops the
    * curation sinks growing one `batch_id=<n>` partition per micro-batch
    * forever (the small-files disease: at 10⁴–10⁵ batches the per-probe
    * file listing and plan size degrade every [[readOrEmpty]] — the same
    * problem the ANN index solves with [[Similarity.compactIndex]] and the
    * kupo index with `GraftIndex.compact`, reference analogue SQLite.hs's
    * post-copy compaction discipline). Folds the partitions with
    * `batch_id <= upTo` of every sink down to at most `maxRuns`
    * consolidated partitions (default 1: ONE `batch_id=<max folded id>`
    * partition — the offline one-shot shape; the streaming cadence passes
    * maxRuns > 1 for tiered, bounded-write-amplification maintenance),
    * rows verbatim (registers keep their linear/max merge laws untouched
    * — they are NOT folded here, only re-filed), so every probe and
    * telemetry fold reads exactly the same frame as before: runs are
    * contiguous in id and file under their max id, so a later batch's
    * `batch_id < id` filter sees the consolidated partitions iff it saw
    * the originals.
    *
    * `upTo` MUST be strictly below any batch id that may still replay —
    * with Structured Streaming that is every id except the current
    * in-flight one (replays overwrite their own `batch_id=<id>` subtree;
    * folding a replayable batch would leave its rows both in the
    * consolidated partition and in the replay's fresh one).
    *
    * Crash discipline (per sink, offline-job contract like
    * [[Similarity.compactIndex]]): the consolidated tree is written to a
    * dot-prefixed dir (invisible to parquet listing), originals are
    * renamed aside into a trash dir, ONE rename publishes the consolidated
    * partition, then trash is deleted. A crash at any point leaves the
    * data recoverable, and the next invocation self-heals EVERY stale
    * attempt, whatever its fold point was ([[healCrashedAttempts]]): a
    * leftover work dir means the publish never happened (originals
    * restore from trash and the attempt restarts); trash without a work
    * dir means it did (cleanup finishes). */
  def compactSinks(spark: SparkSession, sinks: CurationSinks, upTo: Long,
                   corpusPartitions: Int = 1, maxRuns: Int = 1): Unit = {
    require(corpusPartitions >= 1, s"corpusPartitions must be >= 1, got $corpusPartitions")
    require(maxRuns >= 1, s"maxRuns must be >= 1, got $maxRuns")
    // the CORPUS holds the survivor documents themselves — at scale its
    // consolidated partition must stay multi-file (size the parameter to
    // ~rows/128MB); the signature/register sinks are sketch-sized by
    // construction (bounded per batch by banding / 2^p / d·w / 64·s) and
    // genuinely belong in one file each
    compactOne(spark, sinks.corpusDir, upTo, Nil, corpusPartitions, maxRuns)
    compactOne(spark, sinks.sigDir, upTo, Nil, 1, maxRuns)
    compactOne(spark, sinks.vecDir, upTo, Seq("cell"), 1, maxRuns)
    compactOne(spark, sinks.idxDir, upTo, Seq("cell"), 1, maxRuns)
    Seq("/hll", "/qlen", "/cms", "/hhcand")
      .foreach(s => compactOne(spark, sinks.statsDir + s, upTo, Nil, 1, maxRuns))
  }

  /** Self-heal EVERY crashed earlier attempt, whatever its upTo was: a
    * leftover work dir means that attempt's publish never happened —
    * originals in its trash are authoritative and restore; trash without
    * a work dir means the publish DID happen and only the cleanup was
    * interrupted. Keying recovery to the current upTo alone would strand
    * rows renamed aside by a crashed attempt at a DIFFERENT fold point
    * (dot-prefixed dirs are invisible to parquet listing — silent loss;
    * the streaming cadence never reuses an upTo, so that was the common
    * case, not the rare one). */
  private def healCrashedAttempts(fs: org.apache.hadoop.fs.FileSystem,
                                  root: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.Path
    val attempt = """\.compact-(\d+)""".r
    val ids = fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap {
      st => st.getPath.getName match {
        case attempt(n)              => Some(n.toLong)
        case s if s.startsWith(".compact-") && s.endsWith(".trash") =>
          attempt.findFirstMatchIn(s).map(_.group(1).toLong)
        case _                       => None
      }
    }.distinct
    ids.foreach { id =>
      graft.index.AtomicSwap.heal(fs, new Path(root, s".compact-$id"),
        new Path(root, s".compact-$id.trash"), root, "compactSinks")
    }
  }

  private[graft] def compactOne(spark: SparkSession, dir: String, upTo: Long,
                         partCols: Seq[String], nParts: Int,
                         maxRuns: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    healCrashedAttempts(fs, root)
    val re = """batch_id=(\d+)""".r
    val originals = fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { st =>
      st.getPath.getName match {
        case re(n) if n.toLong <= upTo => Some(n.toLong -> st.getPath)
        case _                         => None
      }
    }.sortBy(_._1)
    if (originals.size <= math.max(maxRuns, 1)) return // already telescoped (idempotent)
    // TIERING (maxRuns > 1): the same smallest-adjacent-pair policy as
    // GraftIndex.compactSegments — partitions sorted by id fold into runs
    // until at most maxRuns remain, always merging the cheapest adjacent
    // pair by byte size. Young small partitions fold often, a big old
    // consolidated run is rarely touched: amortized O(log B) rewrites per
    // row instead of the O(B/cadence) a refold-everything policy costs at
    // streaming scale. maxRuns == 1 is the degenerate full fold (the
    // offline one-shot shape the explicit API defaults to).
    def sizeOf(p: Path): Long = fs.getContentSummary(p).getLength
    val runs = graft.index.GraftIndex.tierAdjacent(
      originals.map { case (id, p) => Vector((id, p, sizeOf(p))) }.toVector,
      (run: Vector[(Long, Path, Long)]) => run.map(_._3).sum,
      maxRuns)
    // each multi-partition run folds through its own atomic work/trash
    // cycle into `batch_id=<run max id>` — ids in a run are contiguous, so
    // any later probe's `batch_id < id` filter (id > upTo always) sees
    // exactly the same rows before and after; a crash between runs leaves
    // every run either folded or untouched, and healCrashedAttempts
    // finishes the in-flight one next time
    runs.filter(_.size > 1).foreach { run =>
      foldRun(spark, fs, root, run.map(_._2), run.map(_._1).max, partCols, nParts)
    }
  }

  private def foldRun(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
                      root: org.apache.hadoop.fs.Path,
                      sources: Seq[org.apache.hadoop.fs.Path], target: Long,
                      partCols: Seq[String], nParts: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val work = new Path(root, s".compact-$target")
    val trash = new Path(root, s".compact-$target.trash")
    // a run whose batches were all empty (marker trees, no data files) has
    // nothing to fold with Spark — re-file as a pure rename: publish an
    // empty marker under the run's max id (same read surface as before).
    // basePath pins partition discovery to the sink root so the per-run
    // subtree read sees the same (batch_id, cell, ...) layout a whole-tree
    // read would — without it Spark refuses mixed partition depths
    val folded =
      try Some(spark.read.option("basePath", root.toString)
        .parquet(sources.map(_.toString): _*).drop("batch_id"))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(_.startsWith("UNABLE_TO_INFER_SCHEMA")) =>
          None
      }
    folded match {
      case Some(df) =>
        // one task per partition value (or nParts files for unpartitioned
        // sinks) — the file-count bound the job exists for
        val sized =
          if (partCols.nonEmpty) df.repartition(partCols.map(col): _*)
          else if (nParts == 1) df.coalesce(1)
          else df.repartition(nParts)
        (if (partCols.nonEmpty) sized.write.partitionBy(partCols: _*) else sized.write)
          .mode("overwrite").parquet(work.toString)
      case None => fs.mkdirs(work) // empty marker tree
    }
    graft.index.AtomicSwap.publishDir(fs, work, new Path(root, s"batch_id=$target"),
      trash, sources, "compactSinks")
  }

  /** Wire [[curateBatch]] under a streaming source: one `foreachBatch`
    * run to completion (availableNow) — the deployment shape; tests use
    * MemoryStream + processAllAvailable through the same function.
    *
    * `compactEvery = Some(n)` makes the stream SELF-MAINTAINING: every n
    * batches, [[compactSinks]] telescopes partitions `<= id − 1` before
    * the batch's own work — TIERED (`compactMaxRuns` runs, default 8),
    * not a full refold: a refold-everything cadence rewrites all
    * accumulated rows every n batches (O(B²/n) cumulative write volume
    * at the 10⁴–10⁵-batch scale this job exists for), while the tiered
    * policy folds young small partitions often and touches the big old
    * runs rarely — amortized O(log B) rewrites per row, the same trade
    * `GraftIndex.compactSegments` makes for the kupo index. Folding only
    * STRICTLY-EARLIER batches keeps the replay contract intact — the
    * engine replays at most the in-flight batch id, which is never
    * folded; if the batch fails after its compaction ran, the replay
    * re-runs a now-idempotent fold and then the batch itself, landing in
    * exactly the same state. */
  def run(stream: DataFrame, art: CurationArtifacts, sinks: CurationSinks,
          checkpointDir: String, compactEvery: Option[Int] = None,
          compactMaxRuns: Int = 8, corpusPartitions: Int = 1): Unit = {
    compactEvery.foreach(n => require(n >= 1, s"compactEvery must be >= 1, got $n"))
    // fail FAST, not on the first cadence firing mid-stream
    require(compactMaxRuns >= 1, s"compactMaxRuns must be >= 1, got $compactMaxRuns")
    // corpusPartitions bounds the file count of each folded corpus run; the
    // default 1 fits tests and small sinks, but at scale the biggest run is
    // most of the corpus — a deployment MUST size this so one folded run's
    // partition fits an executor (it threads straight into compactSinks)
    require(corpusPartitions >= 1, s"corpusPartitions must be >= 1, got $corpusPartitions")
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // the engine-assigned id is stable across retries — the overwrite
        // key that makes the at-least-once replay idempotent
        compactEvery.foreach { n =>
          if (id > 0 && id % n == 0)
            compactSinks(batch.sparkSession, sinks, id - 1,
              corpusPartitions = corpusPartitions, maxRuns = compactMaxRuns)
        }
        curateBatch(batch, art, sinks, id); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The ONE-SHOT reference the incremental pipeline must equal on any
    * batch split of the same input (docs in id order): gate everything,
    * then drop every doc with a text-band or semantic match to ANY
    * smaller-id gate-passing doc. */
  def curateReference(all: DataFrame, art: CurationArtifacts): DataFrame = {
    val filtered = gate(all, art)
    val sigs = Dedup.minhashFromGrams(Dedup.charGrams(filtered, art.shingle))
    val assigned = Similarity.assignCells(
      filtered.select(col("doc_id").as("vec_id"), col("embedding")),
      art.centroids, metric = "l2")
    val drop = Dedup.lshCandidatePairs(sigs, art.bands, art.rowsPerBand)
      .select(col("doc_b").as("doc_id"))
      .unionByName(Dedup.semanticPairs(assigned, art.semanticTau)
        .select(col("doc_b").as("doc_id")))
      .distinct()
    filtered.join(drop, Seq("doc_id"), "left_anti")
  }
}
