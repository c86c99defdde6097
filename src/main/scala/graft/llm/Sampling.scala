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

  /** Deterministic global shuffle + shard assignment — the training-order
    * step between curation and the data loader: every epoch reads the docs
    * in an order that is (a) statistically shuffled, (b) bit-reproducible
    * from the salt alone, and (c) stable under re-runs on any engine. The
    * shard is the first hex nibble of md5(salt ‖ id) — 16 shards, kept AS
    * the hex character so no engine ever does base conversion — and the
    * position within a shard is the rank of the full hash (ties broken by
    * id; md5 collisions on distinct salted ids are the only tie source).
    *
    * Scale shape: shard assignment is a pure map; the within-shard rank
    * decomposes over sub-shards exactly like [[shardRanked]] — `_sub` (the
    * next two hex chars of the hash) is a further PREFIX of the sort key,
    * so (shard, _sub, _k, id) order == (shard, _k, id) order and positions
    * are bit-identical to the single-window form while the rank runs as
    * 16·256 tasks instead of 16 whole-shard single-task sorts (~6 TB each
    * on a 100 TB corpus — the same ceiling epochOrder had). A shard's
    * ordered stream is the concatenation of its sub-partitions in `_sub`
    * order (sub-ranges are contiguous by construction), so a per-shard
    * writer is a sorted concat, not a re-sort. A wider shard space (two
    * nibbles → 256 shards) is the same expression with length 2. */
  def shardAssignment(docs: DataFrame, salt: String = "shard",
                      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = md5(concat(lit(salt), col(idCol).cast("string")))
    val keyed = docs.select(col(idCol), k.as("_k"),
      substring(k, 1, 1).as("shard"), substring(k, 2, 2).as("_sub"))
    // (shard, sub) counts → exclusive within-shard prefix offsets: a tiny
    // 16×256-row frame, windowed per shard (16 partitions — no
    // unpartitioned-window warning, no corpus rows)
    val offsets = keyed.groupBy("shard", "_sub").agg(count(lit(1)).as("_n"))
      .withColumn("_offset", coalesce(sum(col("_n")).over(
        Window.partitionBy(col("shard")).orderBy(col("_sub"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("shard", "_sub", "_offset")
    keyed.join(broadcast(offsets), Seq("shard", "_sub"))
      .withColumn("pos", col("_offset") + row_number().over(
        Window.partitionBy(col("shard"), col("_sub"))
          .orderBy(col("_k"), col(idCol))).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Cluster-balanced subsampling — the topic-diversity cap: given a frame
    * with a group column (an IVF cell, a k-means topic, a source), keep at
    * most `cap` rows per group, chosen by a salted hash so the within-group
    * pick is uniform and reproducible (NOT "first by id", which biases
    * toward old data). Each kept row carries its group's total size, so the
    * realized kept/total mix is read off the output. Head-heavy cluster
    * distributions (the common case after embedding clustering) flatten to
    * ≤ cap·|groups| rows.
    *
    * Scale shape: the within-group rank decomposes over sub-shards (the
    * first two hex chars of the pick hash — a PREFIX of the rank key, so
    * picks are bit-identical to the single-window form): a giant cluster
    * ranks as ≤256 tasks, never one. Better, a sub-shard whose offset is
    * already ≥ cap provably contributes no pick, so the inner join against
    * the offsets frame DROPS its rows before the rank window ever sees
    * them — on a head-heavy cluster the ranked volume is ~cap-bounded, not
    * group-bounded. The offsets frame is |groups|·≤256 rows (NOT
    * broadcast: it shares the (group, sub) exchange the rank needs
    * anyway), and n_group rides it from a per-group window over ≤256-row
    * partitions. */
  def balancedSample(rows: DataFrame, groupCol: String, cap: Int,
                     idCol: String = "doc_id", salt: String = "bal"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit(salt), col(idCol).cast("string")))
    // `_g` is the group key wrapped in a single-field struct: struct values
    // compare null-field-equal in joins, so a NULL group forms its own
    // group exactly as the pre-decomposition window form ranked it as its
    // own partition — an inner join bare on groupCol silently dropped it.
    val keyed = rows.select(col(idCol), col(groupCol),
      struct(col(groupCol)).as("_g"), h.as("_h"),
      substring(h, 1, 2).as("_sub"))
    val offsets = keyed.groupBy(col("_g"), col("_sub")).agg(count(lit(1)).as("_n"))
      .withColumn("_offset", coalesce(sum(col("_n")).over(
        Window.partitionBy(col("_g")).orderBy(col("_sub"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_group", sum(col("_n")).over(
        Window.partitionBy(col("_g"))))
      .where(col("_offset") < cap)
      .select(col("_g"), col("_sub"), col("_offset"), col("n_group"))
    keyed.join(offsets, Seq("_g", "_sub"))
      .withColumn("pick", (col("_offset") + row_number().over(
        Window.partitionBy(col("_g"), col("_sub"))
          .orderBy(col("_h"), col(idCol)))).cast("long"))
      .where(col("pick") <= cap)
      .select(col(idCol), col(groupCol), col("pick"), col("n_group"))
  }

  /** Token-budget-capped sampling — mix design in TOKENS, not doc counts:
    * within each stratum, documents are taken in descending `rankCol` order
    * (quality score, LM score …; ties broken by id) until the stratum's
    * token budget fills. A document is kept iff the tokens BEFORE it are
    * under budget — so the budget boundary doc is kept (the budget is a
    * floor on coverage, not a ceiling), and a lone oversized top doc is
    * kept rather than leaving its stratum empty. Tokens are non-empty
    * whitespace splits; cumulative sums are exact integers.
    *
    * Scale shape: the per-stratum running sum decomposes over rank-range
    * buckets, the [[graft.llm.TextAnalysis.qualityTokenCurve]] prefix
    * discipline. Cut points come from one of two sources — and because
    * they steer only bucket SIZES, never membership of the output (see the
    * monotonicity argument below), the choice is purely a cost knob:
    *
    *  - `rankRange = Some((lo, hi))`: `rankBuckets − 1` ARITHMETIC cut
    *    points on [lo, hi], pure literals — zero extra jobs. For rank
    *    columns with a known range (quality scores in [0, 1]); a wrong or
    *    stale range only skews bucket sizes, the output is unchanged.
    *  - `rankRange = None`: a narrow-column `percentile_approx` pass —
    *    over a deterministic 1/16 id-hash sample, since the bounds cannot
    *    affect the output — SAMPLES the cut points of `_r` per stratum.
    *
    * Rows bucket by how many cut points sit at or above their `_r` — a
    * monotone function of `_r` ALONE, so rows tying on `_r` land in one
    * bucket and (bucket, `_r` desc, id) order == (`_r` desc, id) order:
    * positions and the kept set are bit-identical to the single-window
    * form for ANY cut points (sampled-bound nondeterminism and a
    * misdeclared rankRange alike cannot reach the output). Per-bucket
    * token sums → exclusive prefix offsets on the |strata|·buckets frame;
    * a bucket whose offset already meets the budget provably contributes
    * no kept row (every row's tokens-before ≥ the offset) and is PRUNED
    * before the rank window ever sees its rows — a 3-source 100 TB mix
    * runs ~budget-bounded ranked volume across 3·`rankBuckets` tasks
    * instead of ~33 TB through each of 3. NULL `_r` sorts last (one
    * past-the-cuts bucket), NULL strata form their own stratum
    * (struct-wrapped null-safe keys) — both exactly as the window form
    * ordered them. */
  def budgetCappedSample(docs: DataFrame, tokenBudget: Long, rankCol: Column,
                         stratumCol: String = "source",
                         idCol: String = "doc_id", textCol: String = "text",
                         rankBuckets: Int = 64,
                         rankRange: Option[(Double, Double)] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rankBuckets >= 1 && rankBuckets <= 4096,
      s"rankBuckets must be in [1, 4096], got $rankBuckets")
    val base = docs.select(col(stratumCol), struct(col(stratumCol)).as("_g"),
      col(idCol), rankCol.as("_r"),
      size(filter(split(col(textCol), " "), t => t =!= "")).cast("long").as("n_tokens"))
    // Size-aware cut-over (spark_optimization_guide §1.2, r14 verdict item
    // 3): the rank-range decomposition exists to keep any one stratum off a
    // single window task at corpus scale, but it costs ~2 extra exchanges +
    // the offsets join — pure overhead when the whole input comfortably
    // fits one task. Below `spark.graft.sample.budget.singleWindowMaxBytes`
    // (plan-estimated input bytes, default 64 MB — a per-stratum window
    // over ≤64 MB of docs is a trivial task on any executor) the original
    // single-window form runs instead. The kept set AND positions are
    // bit-identical by the bucketing monotonicity argument above (LlmSpec
    // pins the equality across both paths), so the threshold is purely a
    // cost knob; a real corpus blows it and decomposes as before. The
    // estimate is plan-time metadata — no extra job.
    val singleMax = docs.sparkSession.conf
      .get("spark.graft.sample.budget.singleWindowMaxBytes", (64L << 20).toString).toLong
    if (docs.queryExecution.optimizedPlan.stats.sizeInBytes <= singleMax) {
      return base
        .withColumn("cum_tokens", sum(col("n_tokens")).over(
          Window.partitionBy(col("_g"))
            .orderBy(col("_r").desc_nulls_last, col(idCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .where(col("cum_tokens") - col("n_tokens") < tokenBudget)
        .select(col(stratumCol), col(idCol), col("n_tokens"), col("cum_tokens"))
    }
    // NULL _r must sort after every cut-point bucket; the non-null branch
    // is column-derived even at rankBuckets = 1 so EliminateWindowPartitions
    // never folds the partition key to a literal (the unpartitioned-window
    // trap). Bucket = #{cut points ≥ _r}: monotone non-increasing in _r.
    val bucketed =
      if (rankBuckets == 1)
        base.withColumn("_b", when(col("_r").isNull, lit(1)).otherwise(lit(0)))
      else if (rankRange.isDefined) {
        // literal arithmetic cuts: the whole bounds machinery vanishes —
        // no extra scan, no broadcast join, just a codegen'd count over a
        // (rankBuckets−1)-element literal array per row
        val (lo, hi) = rankRange.get
        require(lo <= hi, s"rankRange must be ordered, got ($lo, $hi)")
        val cutVals = (1 until rankBuckets)
          .map(i => lit(lo + (hi - lo) * i / rankBuckets))
        base.withColumn("_b", when(col("_r").isNull, lit(rankBuckets + 1))
          .otherwise(size(filter(array(cutVals: _*), c => c >= col("_r")))))
      } else {
        val cuts = (1 until rankBuckets).map(i => lit(i.toDouble / rankBuckets))
        // the bounds pass runs over a DETERMINISTIC 1/16 sample (first hex
        // char of a salted id hash): bounds steer only bucket sizes, never
        // the output, so sampling costs nothing in correctness and cuts the
        // pass's rank-column compute 16× — the pass exists to size buckets,
        // not to be exact. A stratum with no sampled row falls out of the
        // broadcast and LEFT-joins to null cuts → its rows share bucket 0
        // (single-bucket fallback, still correct).
        val bounds = docs
          .where(substring(md5(concat(lit("bcs:"), col(idCol).cast("string"))), 1, 1)
            === lit("0"))
          .select(struct(col(stratumCol)).as("_g"), rankCol.as("_r"))
          .groupBy(col("_g"))
          .agg(percentile_approx(col("_r"), array(cuts: _*), lit(1000)).as("_cuts"))
        base.join(broadcast(bounds), Seq("_g"), "left")
          .withColumn("_b", when(col("_r").isNull, lit(rankBuckets + 1))
            .otherwise(coalesce(
              size(filter(col("_cuts"), c => c >= col("_r"))), lit(0))))
          .drop("_cuts")
      }
    // per-(stratum, bucket) token mass → exclusive prefix offsets over the
    // tiny bucket frame (|strata|·≤rankBuckets rows — windowed per stratum,
    // never corpus rows); the offsets join shares the (stratum, bucket)
    // exchange the rank window needs anyway, so it is NOT broadcast.
    val offsets = bucketed.groupBy(col("_g"), col("_b"))
      .agg(sum(col("n_tokens")).as("_t"))
      .withColumn("_toff", coalesce(sum(col("_t")).over(
        Window.partitionBy(col("_g")).orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .where(col("_toff") < tokenBudget)
      .select(col("_g"), col("_b"), col("_toff"))
    bucketed.join(offsets, Seq("_g", "_b"))
      .withColumn("cum_tokens", col("_toff") + sum(col("n_tokens")).over(
        Window.partitionBy(col("_g"), col("_b"))
          .orderBy(col("_r").desc, col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum_tokens") - col("n_tokens") < tokenBudget)
      .select(col(stratumCol), col(idCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * re-balancing rule (Conneau & Lample's XLM sampling, α = 0.5): a
    * stratum's sampling probability is proportional to its token mass raised
    * to α < 1, flattening head strata and up-weighting tails without ever
    * starving either. α is FIXED at 0.5 because x^0.5 = sqrt(x) is the one
    * fractional power IEEE 754 requires correctly rounded — p_temp stays
    * bit-reproducible in any engine, where pow(x, 0.4) would not be.
    *
    * Output per stratum: exact token count, p_raw = its share of the corpus,
    * p_temp = sqrt-share. The sqrt-mass total is an ORDERED fold over the
    * stratum-sorted weights (collect → sort → sequential sum — the
    * [[graft.llm.Similarity.dot]] discipline), so the float denominator is
    * identical in every engine too.
    *
    * Scale shape: one map-side-combined aggregation keyed by the stratum,
    * then a single-row broadcast of the totals back onto the |strata|-row
    * frame — the corpus is read once; everything after is O(|strata|). */
  def temperatureMixWeights(docs: DataFrame, stratumCol: String = "source",
                            textCol: String = "text"): DataFrame = {
    val perStratum = docs.groupBy(col(stratumCol))
      .agg(sum(size(filter(split(col(textCol), " "), t => t =!= "")))
        .cast("long").as("n_tokens"))
    val totRow = broadcast(perStratum.agg(
      sum(col("n_tokens")).as("n_total"),
      aggregate(
        array_sort(collect_list(struct(col(stratumCol).as("s"),
          sqrt(col("n_tokens").cast("double")).as("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("w_total")))
    perStratum.crossJoin(totRow)
      .select(col(stratumCol), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_total").cast("double")).as("p_raw"),
        (sqrt(col("n_tokens").cast("double")) / col("w_total")).as("p_temp"))
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): score every document
    * by how much more likely its content is under a TARGET distribution
    * (the high-quality set you want more of — a wiki slice, one language, a
    * curated domain) than under the RAW pool, using hashed bag-of-ngram
    * models. Selection is then downstream: rank by the weight or feed it to
    * [[budgetCappedSample]] as the rank column (the resampling step).
    *
    * Features are word unigrams hashed into 16^`hexChars` buckets (the first
    * `hexChars` hex chars of md5 — the paper's hashed-ngram collapse, which
    * is what makes the model broadcast-sized no matter the vocabulary).
    * Both models live on the SAME bucket space: T(b) = target-token count,
    * R(b) = raw-pool count (all docs, target included), add-1 smoothed.
    *
    * INTEGER-EXACT, the [[graft.llm.TextAnalysis.bigramSurprisal]]
    * discipline: instead of float log-ratios — whose summation order is
    * engine-dependent — each token contributes
    * `bitlen(T(b)+1) − bitlen(R(b)+1) + bitlen(N_raw+1) − bitlen(N_tgt+1)`
    * (bitlen n = ⌊log₂ n⌋ + 1 via `length(bin(n))`): a per-term integer
    * quantization of log₂[p̂_tgt(b)/p̂_raw(b)] exact in any engine, order-free
    * under summation, monotone in the true log-ratio to within 1 bit per
    * term. Output: (doc_id, n_tokens, dsir_bits) — higher = more target-like;
    * docs with no non-empty tokens have no feature rows and drop out
    * (mirrored by the oracle's token <> '' filter).
    *
    * Scale shape: ONE token explode feeds both the model build and the
    * scoring pass (the per-(doc, bucket) aggregate is the shared subtree —
    * canonically identical on both branches, so AQE reuses its exchange and
    * the corpus explodes once). The bucket models are ≤ 16^hexChars rows
    * (map-side-combined) and BROADCAST back onto the count stream with the
    * two totals as a second single-row broadcast — the corpus never shuffles
    * on the bucket; the only corpus-sized exchange is the per-doc aggregate.
    * At 100 TB the target set is tiny and the raw model ships like a
    * pretrained artifact. */
  def importanceWeights(docs: DataFrame, isTarget: Column, hexChars: Int = 2,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(hexChars >= 1 && hexChars <= 7, "bucket space must fit an int")
    val toks = docs.select(col(idCol), isTarget.as("is_target"),
        explode(split(col(textCol), " ")).as("token"))
      .where(col("token") =!= "")
      .select(col(idCol), col("is_target"),
        conv(substring(md5(col("token")), 1, hexChars), 16, 10).cast("int").as("b"))
      // vacuously true (conv of an md5 substring is never null) but stated
      // EXPLICITLY: the scoring join infers isnotnull(b) and pushes it into
      // ITS copy of the subtree below — the totals branch has no such join,
      // so without this filter its subtree canonicalizes differently, AQE
      // cannot reuse the (doc, bucket) exchange, and the corpus explodes
      // twice (the bigramSurprisal discipline)
      .where(col("b").isNotNull)
    // per-(doc, bucket) counts FIRST — the one corpus-sized aggregate both
    // the models and the scoring derive from (is_target is doc-constant, so
    // carrying it through the key adds no rows)
    val dbc = toks.groupBy(col(idCol), col("is_target"), col("b"))
      .agg(count(lit(1)).as("c"))
    val model = dbc.groupBy(col("b"))
      .agg(sum(col("c")).as("c_raw"),
        sum(when(col("is_target"), col("c")).otherwise(0L)).as("c_tgt"))
    val totals = model.agg(sum(col("c_raw")).as("n_raw"), sum(col("c_tgt")).as("n_tgt"))
    dbc.join(broadcast(model), "b")
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        sum(col("c") * ((length(bin(col("c_tgt") + 1)) - length(bin(col("c_raw") + 1)))
          + (length(bin(col("n_raw") + 1)) - length(bin(col("n_tgt") + 1)))))
          .cast("long").as("dsir_bits"))
  }

  /** Sliding-window chunking — the retrieval-index / context-window prep
    * step: each document splits into `window`-token chunks every `stride`
    * tokens (stride < window ⇒ overlapping context, the RAG-chunker
    * layout). Chunk count is 1 + ⌈max(0, n − window) / stride⌉ — the
    * minimal grid cover, so the final chunk may be partial but is never
    * fully contained in its predecessor, and every token appears in at
    * least one chunk. Tokens are non-empty whitespace splits (consistent
    * with [[packSequences]]); zero-token docs yield no chunks. All
    * arithmetic is integer (DIV), exact in any engine.
    *
    * Scale shape: a pure map — explode multiplies rows by ~n/stride but
    * involves NO shuffle at all; the chunk stream feeds the embedding/
    * index stage downstream, which imposes its own partitioning. */
  def chunkWithOverlap(docs: DataFrame, window: Int, stride: Int,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(stride >= 1 && window >= stride,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol),
        filter(split(col(textCol), " "), t => t =!= "").as("toks"))
      .where(size(col("toks")) >= 1)
      .select(col(idCol), col("toks"), size(col("toks")).cast("long").as("n"),
        explode(sequence(lit(0),
          expr(s"CAST((greatest(size(toks) - $window, 0) + ${stride - 1}) DIV $stride AS INT)")))
          .as("k"))
      .select(col(idCol),
        col("k").cast("long").as("chunk_idx"),
        (col("k") * stride).cast("long").as("start_tok"),
        least(lit(window), col("n") - col("k") * stride).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", slice(col("toks"), col("k") * stride + 1, lit(window))).as("chunk_text"))
  }

  /** Sequence packing, concatenate-and-chunk style (the GPT-pretraining
    * layout): within each stream (source shard), documents concatenate in
    * `idCol` order and the token stream is cut every `capacity` tokens;
    * each doc reports its start offset in the stream and the chunk (`bin`)
    * it starts in. Tokens are non-empty whitespace splits — consecutive
    * spaces and empty documents count ZERO tokens, consistent with
    * [[TextAnalysis]]'s tokenizers. Exact integers throughout.
    *
    * NULL KEYS ARE DROPPED: a row with a null `idCol` or `streamCol` is
    * excluded from the packed output (it has no position in any stream —
    * there is no order for a null id and no stream for a null shard key).
    * Callers packing a corpus that may carry null keys must repair or
    * filter them explicitly first; docs silently disappearing from a
    * packing is worse than an upfront decision (ADVICE r6).
    *
    * Scale shape — HIERARCHICAL prefix sum, so one giant stream never
    * serializes onto one partition: docs land in range-contiguous
    * sub-streams (`floor(id / subStreamWidth)`), each sub-stream computes
    * its local running sum in parallel, and the per-sub totals (a tiny
    * streams × subs frame) take one window pass to become exclusive base
    * offsets that broadcast-stitch back — offsets are bit-identical to the
    * single-window form for ANY width. The payload shuffles ONCE, keyed by
    * (stream, sub); parallelism within a stream is tokens/subStreamWidth.
    * Default width keeps one sub-stream per stream (the sessionization
    * shape); pretraining corpora with few, huge sources pick a width that
    * splits them (SCALE.md §packing). */
  def packSequences(docs: DataFrame, capacity: Int,
                    streamCol: String = "source",
                    idCol: String = "doc_id", textCol: String = "text",
                    subStreamWidth: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the explicit null-key filter matches the stitch join's semantics
    // (null stream/id rows can never join) and — critically — keeps BOTH
    // join branches' scan subtrees canonically IDENTICAL: without it the
    // join's inferred isnotnull constraints push into the window branch
    // but not through the aggregate branch, the subtrees diverge, and AQE
    // cannot reuse the shuffle stage — i.e. the corpus would be scanned
    // and tokenized twice
    val withSub = docs
      .where(col(idCol).isNotNull && col(streamCol).isNotNull)
      .select(col(idCol), col(streamCol),
        size(filter(split(col(textCol), " "), t => t =!= "")).cast("long").as("n_tokens"),
        // integer DIV keeps sub-stream ranges exact for 64-bit ids (a
        // double-rounded division would misplace ids above 2^53)
        expr(s"CAST(`$idCol` DIV $subStreamWidth AS BIGINT)").as("_sub"))
      // the _sub null-check mirrors the constraint the stitch join infers
      // on the window branch only — stating it here keeps it in the SHARED
      // subtree (see the canonical-equality note above)
      .where(col("_sub").isNotNull)
    val wLocal = Window.partitionBy(col(streamCol), col("_sub")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withSub.withColumn("_local_end", sum(col("n_tokens")).over(wLocal))
    // exclusive per-stream prefix over the per-sub totals: rows = streams ×
    // subs (broadcast-sized by construction — width is picked so a stream
    // has at most thousands of subs). The total is read off the window
    // output (max running sum == sub total, n_tokens >= 0) rather than
    // re-aggregated from n_tokens: aggregating the pre-window column lets
    // column pruning drop the window from this branch, splitting it into a
    // SECOND corpus scan + tokenize pass — keeping the branch on
    // _local_end makes both sides of the stitch join share one exchange
    // (ReusedExchange), so the corpus is scanned and tokenized ONCE
    val wSub = Window.partitionBy(col(streamCol)).orderBy(col("_sub"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = local.groupBy(col(streamCol), col("_sub"))
      .agg(max(col("_local_end")).as("_sub_total"))
      .withColumn("_base", sum(col("_sub_total")).over(wSub) - col("_sub_total"))
      .select(col(streamCol), col("_sub"), col("_base"))
    local.join(broadcast(bases), Seq(streamCol, "_sub"))
      .withColumn("start_offset", col("_base") + col("_local_end") - col("n_tokens"))
      // integer DIV: a 100 TB token stream overflows double-exact range
      // (2^53), so float division could misbin the tail
      .withColumn("bin", expr(s"CAST(start_offset DIV $capacity AS BIGINT)"))
      .select(col(idCol), col(streamCol), col("n_tokens"), col("start_offset"), col("bin"))
  }

  /** Deterministic train/val split labels: `train` iff the salted hash
    * bucket falls under `trainThreshold` (two lowercase hex digits, e.g.
    * "cc" ≈ 80%), else `val` — the [[hashBucket]] discipline, so the split
    * is reproducible from the salt alone on any engine. Pure map. */
  def splitAssign(docs: DataFrame, trainThreshold: String = "cc",
                  idCol: String = "doc_id", salt: String = "split"): DataFrame = {
    // the threshold compares LEXICOGRAPHICALLY against a two-lowercase-hex
    // bucket — "CC", "c", or "0xcc" would silently misclassify every row
    require(trainThreshold.matches("[0-9a-f]{2}"),
      s"trainThreshold must be two lowercase hex digits (e.g. \"cc\"): '$trainThreshold'")
    docs.select(col(idCol),
      when(hashBucket(col(idCol), salt) < lit(trainThreshold), lit("train"))
        .otherwise(lit("val")).as("split"))
  }

  /** DETERMINISTIC EPOCH SHUFFLE — the dataloader's global training
    * order: every doc gets a DENSE position 0..n−1, the rank of its
    * salted hash (tie-broken by id), reproducible from the epoch number
    * alone on any engine. The naive form — `row_number()` over an
    * unpartitioned window — moves the whole corpus to ONE partition;
    * this is the scale-correct decomposition of a global dense rank:
    *   1. prefix-shard by the hash's first `shardChars` hex chars
    *      (16^shardChars RANGE buckets — lexicographic on lowercase hex,
    *      so shard order == key order);
    *   2. count per shard, prefix-sum offsets on that tiny frame (its
    *      single-partition window is 16^shardChars rows, not the corpus);
    *   3. broadcast the offsets back and rank WITHIN each shard:
    *      `position = shard offset + within-shard rank − 1`.
    * The corpus is touched by exactly two shard-keyed exchanges (the
    * count and the rank) and one broadcast join — no single-partition
    * stage ever sees payload rows. Epochs are cheap: a new salt is a new
    * permutation, nothing is stored.
    *
    * `shardChars` trades offset-frame size for rank parallelism: each
    * shard's rank window runs as ONE task sorting corpus/16^shardChars
    * rows, so 1 char caps the whole job at 16 tasks (~6 TB each on a
    * 100 TB corpus — a single-task spill marathon), 2 chars (default)
    * gives 256, 3 gives 4096. Positions are IDENTICAL across widths:
    * `_shard` is a PREFIX of the sort key `_k`, so (shard, _k, id) order
    * == (_k, id) order — gated by an LlmSpec cross-width property. */
  def epochOrder(docs: DataFrame, epoch: Int = 0,
                 idCol: String = "doc_id", shardChars: Int = 2): DataFrame =
    shardRanked(docs, epoch, idCol, slice = None, shardChars)

  /** RESUMABLE SLICE of an [[epochOrder]] — the dataloader restart path:
    * rows with position ∈ [from, until), WITHOUT ranking the whole
    * corpus. The shard offsets (computed from a count-only pass) tell
    * exactly which shards intersect the slice, so the rank window runs
    * over intersecting shards only — resuming at 99% of an epoch ranks
    * ~1/16^shardChars of the corpus, not all of it. Same positions as
    * filtering the full [[epochOrder]] (gated in LlmSpec). */
  def epochSlice(docs: DataFrame, from: Long, until: Long, epoch: Int = 0,
                 idCol: String = "doc_id", shardChars: Int = 2): DataFrame = {
    require(from >= 0 && until >= from, s"bad slice [$from, $until)")
    shardRanked(docs, epoch, idCol, slice = Some((from, until)), shardChars)
      .where(col("position") >= from && col("position") < until)
  }

  /** The shared shard-decomposed global rank behind [[epochOrder]] and
    * [[epochSlice]] — ONE implementation so the shard key, the offset
    * prefix-sum, and the (hash, id) tie-break can never silently diverge
    * between the full order and its resumable slice. */
  private def shardRanked(docs: DataFrame, epoch: Int, idCol: String,
                          slice: Option[(Long, Long)],
                          shardChars: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shardChars >= 1 && shardChars <= 4,
      s"shardChars must be 1..4 (16..65536 shards): $shardChars")
    val k = md5(concat(lit(s"epoch$epoch:"), col(idCol).cast("string")))
    val keyed = docs.select(col(idCol), k.as("_k"),
      substring(k, 1, shardChars).as("_shard"))
    // the offset frame is 16^shardChars rows — the constant-valued partition
    // key keeps it one (tiny) task WITHOUT tripping WindowExec's
    // unpartitioned warning, which would otherwise bury real regressions in
    // the logs. It must be column-DERIVED (substring of the shard, length
    // 0 → "" for every row): a literal key is folded away by Spark 4's
    // EliminateWindowPartitions, reverting to the warning path
    val counted = keyed.groupBy("_shard").agg(count(lit(1)).as("_n"))
      .withColumn("_offset", coalesce(sum(col("_n")).over(
        Window.partitionBy(substring(col("_shard"), 1, 0)).orderBy(col("_shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // a shard spans positions [_offset, _offset + _n) — for a slice, keep
    // only intersecting shards; everything else is pruned BEFORE the rank
    // window ever sees a row
    val offsets = slice.fold(counted) { case (from, until) =>
        counted.where(col("_offset") < until && col("_offset") + col("_n") > from)
      }.select("_shard", "_offset")
    keyed.join(broadcast(offsets), Seq("_shard"))
      .withColumn("position", col("_offset") + row_number().over(
        Window.partitionBy(col("_shard")).orderBy(col("_k"), col(idCol))).cast("long") - 1L)
      .select(col(idCol), col("position"))
  }

  /** SPLIT-LEAKAGE AUDIT — the internal twin of benchmark
    * decontamination: a val doc with a NEAR-DUPLICATE in train is leaked
    * signal (the model effectively trains on the eval row), and external
    * decontamination cannot see it because both docs live in the corpus.
    * Joins the (already ~linear, banding-bounded) candidate-pair artifact
    * against the split labels and keeps pairs that STRADDLE the split.
    * Scale shape: two equi-joins on the doc id over the pair frame — the
    * corpus itself is never re-read or re-shingled. */
  def splitLeakage(splits: DataFrame, pairs: DataFrame,
                   idCol: String = "doc_id"): DataFrame =
    pairs
      .join(splits.select(col(idCol).as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(splits.select(col(idCol).as("doc_b"), col("split").as("split_b")), "doc_b")
      .where(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"))

  /** Quarantine the leaked side: every `val` doc appearing in a
    * straddling pair is relabeled `quarantined` (excluded from BOTH
    * splits). DROPPING — rather than re-assigning to train — is the rule
    * that CLOSES in one pass: a removal can never create a new straddling
    * pair, whereas moving a val doc into train can chain-leak through its
    * other val neighbors. One anti-join-shaped pass; audit-clean
    * afterwards by construction ([[splitLeakage]] over the result is
    * empty, gated in LlmSpec). */
  def quarantineLeakedVal(splits: DataFrame, pairs: DataFrame,
                          idCol: String = "doc_id"): DataFrame = {
    val leakedVal = splitLeakage(splits, pairs, idCol)
      .select(explode(array(
        struct(col("doc_a").as("id"), col("split_a").as("s")),
        struct(col("doc_b").as("id"), col("split_b").as("s")))).as("x"))
      .where(col("x.s") === "val")
      .select(col("x.id").as(idCol))
      .distinct()
    splits.join(leakedVal.withColumn("_leaked", lit(1)), Seq(idCol), "left_outer")
      .select(col(idCol),
        when(col("split") === "val" && col("_leaked").isNotNull, lit("quarantined"))
          .otherwise(col("split")).as("split"))
  }
}
