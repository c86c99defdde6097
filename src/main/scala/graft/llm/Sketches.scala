package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable HyperLogLog — a distinct-count sketch built ENTIRELY
  * from deterministic relational algebra (Flajolet, Fusy, Gandouet &
  * Meunier 2007, "HyperLogLog: the analysis of a near-optimal cardinality
  * estimation algorithm"), so the same derivation runs bit-identically on
  * any engine: hashes are md5 (not an engine's private xxhash), registers
  * are a plain (key, bucket, rho) frame, and the estimate folds the
  * register array in bucket order — the repo's ordered-fold float
  * discipline — so Spark and the DuckDB oracle agree to the last bit.
  * Spark's own `approx_count_distinct` is the production default; THIS
  * sketch is for when the register table itself is the artifact — shipped
  * between engines, unioned across corpus snapshots, diffed across time —
  * and the estimate must be reproducible anywhere.
  *
  * 2^p registers, p ∈ {4,8,12} (bucket = first p/4 hex chars of md5, so
  * the carve stays on hex-digit boundaries; rho = leading-zero count + 1
  * in the next 52 hash bits — 13 hex chars, exact in a BIGINT).
  *
  * Scale shape: [[hllRegisters]] is ONE map-side-combined aggregate on
  * (key, bucket) — ≤ 2^p rows per key survive, whatever the input size;
  * registers MERGE by bucket-wise max (HLL's defining property), so
  * per-partition / per-snapshot sketches combine without re-reading data
  * (property-tested: sketch(A ∪ B) == merge(sketch(A), sketch(B))).
  * [[hllEstimate]] collapses each key's ≤ 2^p register rows into the
  * raw HLL estimate α_m·m²/Σ2^−M — per-key work is constant. The
  * small/large-range corrections (linear counting / 2^32 wraparound) are
  * deliberately NOT applied: both need `ln`, whose last-ulp value is
  * libm-specific, and this sketch's contract is cross-engine
  * bit-equality; callers that want them apply them downstream to the
  * returned (estimate, buckets_hit) pair. */
object Sketches {

  private def checkP(p: Int): Unit =
    require(p == 4 || p == 8 || p == 12,
      s"p must be 4, 8 or 12 (hex-digit bucket carve), got $p")

  /** The ONE register-fold shape every sketch merge shares (and the
    * curation telemetry's n-way folds reuse): group a register frame by
    * (keys ++ the sketch's register coordinates), fold the value column
    * with the sketch's merge law — bucket-wise max for HLL, counter-wise
    * sum for the linear sketches, nothing for Bloom's set union — and
    * verify every carried build-parameter column is CONSTANT within each
    * colliding group (a mixed-parameter merge is a deployment bug and must
    * fail loudly, not blend — the family's both-directions guard
    * discipline). A fifth sketch gets the guard by construction instead of
    * re-rolling it. Parameter columns are named `sk_<x>`; the error names
    * the bare `<x>`. */
  private[graft] def foldRegisters(regs: DataFrame, keyCols: Seq[String],
                                   coordCols: Seq[String],
                                   valueAgg: Option[(String, Column => Column)],
                                   paramCols: Seq[String], ctx: String): DataFrame = {
    val groupCols = (keyCols ++ coordCols).map(col)
    val aggs = valueAgg.toSeq.map { case (c, f) => f(col(c)).as(c) } ++
      paramCols.flatMap(p =>
        Seq(min(col(p)).as(s"_${p}_min"), max(col(p)).as(s"_${p}_max")))
    val guarded = paramCols.map { p =>
      when(col(s"_${p}_min") === col(s"_${p}_max"), col(s"_${p}_min"))
        .otherwise(raise_error(lit(
          s"$ctx: register frames built with different ${p.stripPrefix("sk_")}")))
        .as(p)
    }
    regs.groupBy(groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(groupCols ++ valueAgg.map(v => col(v._1)).toSeq ++ guarded: _*)
  }

  /** Exact integer form of `cnt >= phi·tot` — the heavy-hitter threshold
    * (shared by [[frequentCandidates]], [[cmsHeavyHitters]] and the
    * rehearsal's exact-verification gates, which MUST use the identical
    * predicate or the gates can't see a boundary bug). `ceil(tot * phi)`
    * in doubles inflates the cutoff by 1 exactly when phi·tot is integral
    * but phi isn't representable (0.04·100 → 4.000000000000001 → ceil 5),
    * silently excluding a value whose count EQUALS phi·tot — the boundary
    * row the pigeonhole guarantee is stated over. Compare
    * `cnt·S >= tot·round(phi·S)` in decimal arithmetic instead (S = 10⁹:
    * phi is interpreted at 1e-9 granularity, and decimal(38,0) keeps the
    * products exact far beyond any corpus size). */
  private[graft] def atLeastPhiFraction(cnt: Column, tot: Column, phi: Double): Column = {
    import org.apache.spark.sql.types.DecimalType
    val scale = 1000000000L
    cnt.cast(DecimalType(38, 0)) * lit(scale) >=
      tot.cast(DecimalType(38, 0)) * lit(math.round(phi * scale))
  }

  /** Per-key HLL register frame: (keys..., bucket, m_rho, sk_p) with one row
    * per NON-EMPTY bucket — empty buckets are implicit (the estimate counts
    * them as 2^0). `m_rho` is the max over the bucket's values of
    * (leading zeros in the 52-bit hash suffix + 1); an all-zero suffix
    * saturates at 53. `sk_p` is the build parameter as a constant-folded
    * literal column: it travels WITH the persisted artifact, so merge and
    * estimate can verify it instead of relying on deployment discipline —
    * closing the formerly-undetectable smaller-build-p direction. */
  def hllRegisters(items: DataFrame, keyCols: Seq[String], valueCol: String,
                   p: Int = 8): DataFrame = {
    checkP(p)
    val hexB = p / 4
    val h = md5(col(valueCol).cast("string"))
    val bucket = conv(substring(h, 1, hexB), 16, 10).cast("int").as("bucket")
    val suffix = conv(substring(h, hexB + 1, 13), 16, 10).cast("long")
    val rho = when(suffix === 0L, lit(53))
      .otherwise(lit(53) - length(bin(suffix))).cast("int").as("rho")
    items.select(keyCols.map(col) :+ bucket :+ rho: _*)
      .groupBy((keyCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("m_rho"))
      .withColumn("sk_p", lit(p))
  }

  /** Distinct per-(key, value) HLL coordinates — the single-corpus-pass
    * composition shape: one row per distinct (keys..., value) with its
    * `bucket` carried as a GROUPING key (it is functionally dependent on
    * the value, so the groups are unchanged) and `m_rho` as a real
    * aggregate. Registers derive by one more fold
    * ([[hllRegistersFromCoords]]) and the EXACT distinct count per key is
    * `count(m_rho)` over the same frame — both consumers need the
    * identical grouping keys and aggregate buffer, so they share one
    * Exchange (column pruning cannot differentiate the copies, and the
    * real `max` aggregate keeps RemoveRedundantAggregates from stripping
    * the dedup) instead of re-reading the corpus per consumer
    * (spark_optimization_guide §2.3/§2.4). */
  def hllValueCoords(items: DataFrame, keyCols: Seq[String], valueCol: String,
                     p: Int = 8): DataFrame = {
    checkP(p)
    val hexB = p / 4
    val h = md5(col(valueCol).cast("string"))
    val bucket = conv(substring(h, 1, hexB), 16, 10).cast("int").as("bucket")
    val suffix = conv(substring(h, hexB + 1, 13), 16, 10).cast("long")
    val rho = when(suffix === 0L, lit(53))
      .otherwise(lit(53) - length(bin(suffix))).cast("int").as("rho")
    items.select(keyCols.map(col) :+ bucket :+ col(valueCol) :+ rho: _*)
      .groupBy((keyCols :+ "bucket" :+ valueCol).map(col): _*)
      .agg(max(col("rho")).as("m_rho"))
      .withColumn("sk_p", lit(p))
      .drop(valueCol)
  }

  /** Fold [[hllValueCoords]] into the [[hllRegisters]] frame: bucket-wise
    * max with the carried-parameter guard — byte-identical registers to the
    * direct build (max over per-value maxima == max over raw values). */
  def hllRegistersFromCoords(coords: DataFrame, keyCols: Seq[String]): DataFrame =
    foldRegisters(coords, keyCols, Seq("bucket"),
      Some("m_rho" -> max), Seq("sk_p"), "hllRegistersFromCoords")

  /** Merge two register frames over the same key space: bucket-wise max —
    * the HLL union. Registers from disjoint scans, snapshots, or engines
    * combine exactly; the result is indistinguishable from sketching the
    * concatenated input. The carried `sk_p` parameters are verified
    * per colliding bucket group here (mixed-p rows in one group fail
    * loudly); non-colliding mixed-p inputs survive the merge but are
    * caught by [[hllEstimate]]'s whole-frame check. */
  def hllMerge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    foldRegisters(a.unionByName(b), keyCols, Seq("bucket"),
      Some("m_rho" -> max), Seq("sk_p"), "hllMerge")

  /** Raw HLL estimate per key from a register frame:
    * `est = α_m · m² / ((m − V) + Σ_hit 2^−M_j)` with V = buckets hit and
    * the Σ folded in bucket order from 0.0 — the exact float sequence any
    * engine reproduces. Also returns V (`buckets_hit`), which downstream
    * range corrections need. */
  def hllEstimate(registers: DataFrame, keyCols: Seq[String],
                  p: Int = 8): DataFrame = {
    checkP(p)
    val m = 1 << p
    // Flajolet et al. 2007 §4: α_16=0.673, α_32=0.697, α_4096 (and the
    // general m ≥ 128 case) = 0.7213/(1 + 1.079/m); m=256 uses the
    // general form. Written as one literal expression so every engine
    // computes the identical double.
    val alpha: Column = m match {
      case 16 => lit(0.673)
      case _  => lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    }
    registers
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("buckets_hit"),
        max(col("bucket")).as("_maxb"),
        min(col("sk_p")).as("_pmin"), max(col("sk_p")).as("_pmax"),
        aggregate(
          array_sort(collect_list(struct(col("bucket"), col("m_rho")))),
          lit(0.0),
          (acc, x) => acc + pow(lit(2.0), -x.getField("m_rho"))).as("_s"))
      .select(keyCols.map(col) :+ col("buckets_hit") :+
        // execution guard: the carried sk_p must equal this estimate's p in
        // every register row of the key — catching BOTH directions (a
        // smaller build-p used to be indistinguishable from a sparse
        // sketch); the bucket bound stays as a backstop for hand-built
        // frames whose sk_p lies.
        when(col("_pmin") === p && col("_pmax") === p && col("_maxb") < m,
          alpha * lit(m.toDouble) * lit(m.toDouble) /
            ((lit(m.toDouble) - col("buckets_hit")) + col("_s")))
          .otherwise(raise_error(lit(
            s"hllEstimate: registers disagree with p=$p — built with different p")))
          .as("hll_est"): _*)
  }

  /** Count-Min sketch registers (Cormode & Muthukrishnan 2005, "An
    * Improved Data Stream Summary: The Count-Min Sketch and its
    * Applications") — the FREQUENCY twin of [[hllRegisters]]: `d` hash
    * rows × `w` counters per key; counter (r, c) counts the items whose
    * r-th hash lands in bucket c. Hashes are the d disjoint 8-hex-char
    * carves of one md5 (the [[Dedup.carvedHashes]] idiom) mod w, so the
    * whole sketch is INTEGER arithmetic — cross-engine exact with no
    * float discipline at all. Point estimates ([[cmsEstimate]]) never
    * under-count and over-count by at most ε·N = (e/w)·N with
    * probability 1 − e^(−d).
    *
    * Scale shape: ONE map-side-combined aggregate on (key, row, col) —
    * ≤ d·w surviving rows per key whatever the input size; CMS is a
    * LINEAR sketch, so registers from disjoint scans merge by counter-
    * wise SUM ([[cmsMerge]]), exactly (property-tested like the HLL
    * bucket-max merge). */
  /** The ONE (row, col) bucket derivation both [[cmsRegisters]] and
    * [[cmsEstimate]] use — the d disjoint 8-hex md5 carves mod w. Build
    * and probe MUST hash identically or every estimate silently corrupts
    * (an absent counter reads 0, breaking the never-under-count
    * guarantee), so the derivation must not fork. */
  private def cmsBuckets(valueCol: String, d: Int, w: Int): Column = {
    require(d >= 1 && d <= 4, s"md5 carves at most 4 disjoint 8-hex rows, got d=$d")
    require(w >= 2, s"need at least 2 buckets per row, got w=$w")
    val h = md5(col(valueCol).cast("string"))
    array((0 until d).map(r =>
      (conv(substring(h, r * 8 + 1, 8), 16, 10).cast("long") % w).cast("int")): _*)
  }

  /** Register frame: (keys..., row, col, cnt, sk_d, sk_w) — the build
    * parameters ride as constant-folded literal columns so merge and
    * estimate verify them in BOTH directions (a smaller build-(d, w) used
    * to be indistinguishable from a sparse sketch and silently
    * under-counted — the one thing CMS must never do). */
  def cmsRegisters(items: DataFrame, keyCols: Seq[String], valueCol: String,
                   d: Int = 4, w: Int = 64): DataFrame =
    cmsRegistersWeighted(
      items.select(keyCols.map(col) :+ col(valueCol) :+ lit(1L).as("_w1"): _*),
      keyCols, valueCol, "_w1", d, w)

  /** [[cmsRegisters]] over PRE-AGGREGATED (value, count) rows: each input
    * row contributes `cntCol` occurrences of `valueCol`. CMS is a LINEAR
    * sketch, so summing pre-counted weights yields byte-identical registers
    * to counting raw occurrences — this is the shape that lets one
    * (key, value, cnt) aggregate feed registers, candidate selection and
    * exact verification from a SINGLE corpus pass (the consumers share the
    * aggregate's Exchange instead of each re-exploding the corpus —
    * spark_optimization_guide §2.3/§2.4). */
  def cmsRegistersWeighted(counts: DataFrame, keyCols: Seq[String], valueCol: String,
                           cntCol: String, d: Int = 4, w: Int = 64): DataFrame =
    counts.select(keyCols.map(col) :+ col(cntCol).cast("long").as("_cnt") :+
        posexplode(cmsBuckets(valueCol, d, w)).as(Seq("row", "col")): _*)
      .groupBy((keyCols :+ "row" :+ "col").map(col): _*)
      .agg(sum(col("_cnt")).as("cnt"))
      .withColumn("sk_d", lit(d)).withColumn("sk_w", lit(w))

  /** Merge two CMS register frames over the same key space: counter-wise
    * sum — the linear-sketch union. The merged frame is EXACTLY the
    * sketch of the concatenated input. The carried (sk_d, sk_w) build
    * parameters are verified per colliding counter group (mixed rows fail
    * loudly); non-colliding mixed-parameter inputs are caught by
    * [[cmsEstimate]]'s whole-frame check. */
  def cmsMerge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    foldRegisters(a.unionByName(b), keyCols, Seq("row", "col"),
      Some("cnt" -> sum), Seq("sk_d", "sk_w"), "cmsMerge")

  /** CMS point estimates: for each (key, value) probe row, the min over
    * the d rows of its bucket counter (absent counters read 0). The
    * register frame is ≤ d·w rows per key and joins as a BROADCAST onto
    * the probe stream — probing any number of items is one map-side pass
    * plus the per-probe min aggregate. */
  def cmsEstimate(registers: DataFrame, probes: DataFrame, keyCols: Seq[String],
                  valueCol: String, d: Int = 4, w: Int = 64): DataFrame = {
    // execution guard against a (d, w) mismatch with the register build —
    // in BOTH directions, via the carried (sk_d, sk_w) parameter columns
    // (a silent mismatch reads absent counters as 0: an under-count, the
    // one thing CMS must never do); the row/col bound stays as a backstop
    // for hand-built frames whose parameter columns lie. An EMPTY register
    // frame is a legitimate sketch of empty input: the bounds coalesce to
    // the probe's own parameters, the guard passes, and every probe
    // correctly reads 0.
    val bounds = broadcast(registers.agg(
      coalesce(max(col("row")), lit(-1)).as("_maxr"),
      coalesce(max(col("col")), lit(-1)).as("_maxc"),
      coalesce(min(col("sk_d")), lit(d)).as("_dmin"),
      coalesce(max(col("sk_d")), lit(d)).as("_dmax"),
      coalesce(min(col("sk_w")), lit(w)).as("_wmin"),
      coalesce(max(col("sk_w")), lit(w)).as("_wmax")))
    // `_g` struct-wraps the key columns so the probe→register lookup is
    // NULL-SAFE: register groups keep NULL keys (groupBy retains them) but
    // a bare-column join could never read them back — a NULL-key probe
    // silently estimated 0, the one thing CMS must never do. Struct values
    // compare null-field-equal in joins (the balancedSample discipline).
    probes.select(keyCols.map(col) :+ struct(keyCols.map(col): _*).as("_g") :+
        col(valueCol) :+
        posexplode(cmsBuckets(valueCol, d, w)).as(Seq("row", "col")): _*)
      .join(broadcast(registers.select(
          struct(keyCols.map(col): _*).as("_g"), col("row"), col("col"), col("cnt"))),
        Seq("_g", "row", "col"), "left_outer")
      .crossJoin(bounds)
      .select(keyCols.map(col) :+ col(valueCol) :+
        when(col("_dmin") === d && col("_dmax") === d &&
          col("_wmin") === w && col("_wmax") === w &&
          col("_maxr") < d && col("_maxc") < w, coalesce(col("cnt"), lit(0L)))
          .otherwise(raise_error(lit(s"cmsEstimate: registers disagree with (d=$d, w=$w)" +
            " — built with different parameters"))).as("cnt"): _*)
      .groupBy((keyCols :+ valueCol).map(col): _*)
      .agg(min(col("cnt")).as("cms_est"))
  }

  /** Stage 1 of the sketch-era heavy-hitters pipeline (the counter+sketch
    * hybrid of Cormode & Hadjieleftheriou 2008, "Finding Frequent Items in
    * Data Streams", re-shaped for disjoint shards): per-shard EXACT
    * φ-frequent values. The pigeonhole guarantee: if count(v) ≥ φ·N
    * globally then count_s(v) ≥ φ·N_s in at least one shard — otherwise
    * summing the per-shard strict inequalities gives count(v) < φ·Σ N_s =
    * φ·N, a contradiction. So the union of shard-local frequent sets
    * contains EVERY global φ-heavy hitter, for ANY disjoint sharding of
    * the rows: micro-batches, ingest dates, partition ids. Output is
    * bounded by shards/φ rows per key — a tiny mergeable artifact, the
    * candidate companion to a [[cmsRegisters]] sketch accumulated over the
    * same shards.
    *
    * Scale shape: one map-side-combined (key, shard, value) aggregate;
    * shard totals ride a window over that aggregate's own (already
    * exchanged) output, so no second scan of the input. */
  def frequentCandidates(items: DataFrame, keyCols: Seq[String], valueCol: String,
                         shardCol: String, phi: Double): DataFrame =
    frequentCandidatesFromCounts(
      items.groupBy((keyCols :+ shardCol :+ valueCol).map(col): _*)
        .agg(count(lit(1)).as("_cnt")),
      keyCols, valueCol, shardCol, "_cnt", phi)

  /** [[frequentCandidates]] over a PRE-AGGREGATED (key, shard, value, cnt)
    * frame — the single-corpus-pass composition shape: the caller computes
    * the grouped counts once and feeds candidates, registers
    * ([[cmsRegistersWeighted]]) and exact verification from it, sharing one
    * Exchange instead of re-reading the corpus per consumer. The pigeonhole
    * guarantee is over the counts, so it is indifferent to which side
    * aggregated them. */
  def frequentCandidatesFromCounts(grp: DataFrame, keyCols: Seq[String],
                                   valueCol: String, shardCol: String,
                                   cntCol: String, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"need 0 < phi < 1, got phi=$phi")
    import org.apache.spark.sql.expressions.Window
    grp.withColumn("_cnt", col(cntCol).cast("long"))
      .withColumn("_tot", sum(col("_cnt"))
        .over(Window.partitionBy((keyCols :+ shardCol).map(col): _*)))
      // exact-integer threshold, NOT ceil(_tot * phi) in doubles: when
      // phi·N is integral but phi isn't representable, the FP ceil lands
      // one above and a value whose count exactly equals phi·N silently
      // drops — breaking the no-false-negative pigeonhole guarantee on
      // precisely its boundary case (see [[atLeastPhiFraction]])
      .where(atLeastPhiFraction(col("_cnt"), col("_tot"), phi))
      .select((keyCols :+ valueCol).map(col): _*)
      .distinct()
  }

  /** Heavy hitters FROM THE SKETCH — the raw corpus is not re-read:
    * estimate each candidate against a (possibly [[cmsMerge]]-accumulated)
    * register frame and keep those at or above φ·n, where n per key is
    * read off the sketch itself (every item increments exactly one counter
    * per hash row, so n = Σ cnt over row 0). Both legs of the guarantee
    * are one-sided in the safe direction: the [[frequentCandidates]] union
    * misses no true hitter, and the CMS estimate never under-counts — so
    * no true φ-heavy hitter among the candidates is ever dropped; false
    * positives are bounded by the sketch's ε·N over-count and can be
    * exact-verified with one candidate-filtered pass if the corpus is
    * still available. Registers and candidates are both broadcast-small;
    * the whole decision runs without touching corpus-scale data. */
  def cmsHeavyHitters(registers: DataFrame, candidates: DataFrame,
                      keyCols: Seq[String], valueCol: String, phi: Double,
                      d: Int = 4, w: Int = 64): DataFrame = {
    require(phi > 0 && phi < 1, s"need 0 < phi < 1, got phi=$phi")
    // struct-keyed for the same NULL-safety as cmsEstimate's lookup: a
    // NULL-key group's total is in the sketch and must join back
    val n = registers.where(col("row") === 0)
      .groupBy(struct(keyCols.map(col): _*).as("_g")).agg(sum(col("cnt")).as("n_total"))
    cmsEstimate(registers, candidates, keyCols, valueCol, d, w)
      .withColumn("_g", struct(keyCols.map(col): _*))
      .join(broadcast(n), Seq("_g"))
      // same exact-integer boundary discipline as [[frequentCandidates]]
      .where(atLeastPhiFraction(col("cms_est"), col("n_total"), phi))
      .drop("_g")
  }

  /** DDSketch-style quantile registers (Masson, Lee & Rim 2019, "DDSketch:
    * A Fast and Fully-Mergeable Quantile Sketch with Relative-Error
    * Guarantees") — the QUANTILE member of the sketch family (HLL =
    * distinct, CMS = frequency): values land in relative-width buckets, so
    * any quantile reads back with bounded RELATIVE error from counts
    * alone. This variant is INTEGER-EXACT end to end (the paper's γ-log
    * bucketing needs `log`, which is libm-specific): the coarse bucket is
    * the value's bitlen (the [[hllRegisters]]/bigramSurprisal bitlen
    * discipline) and each power-of-two range [2^(k−1), 2^k) splits
    * linearly into `s` sub-buckets by integer arithmetic — relative error
    * ≤ 1/s per bucket, all bucket math reproducible in any engine.
    * Values must be non-negative longs BELOW 2^40 (fail-loud guard; ≈10¹²
    * covers any per-document metric): within that bound every
    * intermediate — the power-of-two bucket base via `pow(2, k−1)`, the
    * scaled offsets, and the floor divisions — is EXACT in IEEE double on
    * any engine (divisors are powers of two or keep quotients under the
    * half-step-of-1/s ulp), so the DuckDB mirror's integer `//` agrees
    * bit-for-bit. 0 keeps its own bucket.
    *
    * Scale shape: ONE map-side-combined aggregate on (key, qb, sub) —
    * ≤ 64·s surviving rows per key whatever the input size; a LINEAR
    * sketch, so registers from disjoint scans merge by counter-wise SUM
    * ([[quantileMerge]]) exactly, like CMS. The build parameter `sk_s`
    * rides as a literal column and is verified at merge/estimate, the
    * same both-directions discipline as the other two sketches. */
  def quantileRegisters(items: DataFrame, keyCols: Seq[String], valueCol: String,
                        s: Int = 16): DataFrame = {
    require(s >= 1 && s <= 256, s"sub-bucket count must be 1..256, got $s")
    val v = col(valueCol).cast("long")
    val guarded = when(v >= 0 && v < (1L << 40), v).otherwise(raise_error(lit(
      "quantileRegisters: value outside [0, 2^40) — the integer-exact " +
        "bucketing contract (see scaladoc) holds only in that range")))
    val k = when(guarded === 0, lit(0)).otherwise(length(bin(guarded))).cast("int")
    // 2^(k−1) via pow: powers of two are exact doubles; division by one is
    // an exponent shift, so the floor below is exact in any engine
    val lower = pow(lit(2.0), (k - 1).cast("double")).cast("long")
    val sub = when(k === 0, lit(0))
      .otherwise(((v - lower) * s / lower).cast("int"))
    items.select(keyCols.map(col) :+ k.as("qb") :+ sub.as("sub"): _*)
      .groupBy((keyCols :+ "qb" :+ "sub").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("sk_s", lit(s))
  }

  /** Merge two quantile-register frames: counter-wise sum — exactly the
    * sketch of the concatenated input (linear, like [[cmsMerge]]); the
    * carried `sk_s` parameters are verified per colliding group. */
  def quantileMerge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    foldRegisters(a.unionByName(b), keyCols, Seq("qb", "sub"),
      Some("cnt" -> sum), Seq("sk_s"), "quantileMerge")

  /** Quantile estimates from a register frame: for each requested q, the
    * bucket holding the rank-⌈q·n⌉ value (ascending — the exact-rank
    * semantics of lengthQuantiles), reported as its INTEGER bounds
    * [q_lo, q_hi): the true rank value provably satisfies
    * lo ≤ v < hi with (hi − lo) ≤ lower/s, i.e. relative error ≤ 1/s.
    * Exact integers only on the compare surface — any engine agrees to
    * the row. One window pass over the ≤ 64·s register rows per key.
    * The carried sk_s must equal the estimate's parameter in every row
    * (both directions, like [[cmsEstimate]]). */
  def quantileEstimate(registers: DataFrame, keyCols: Seq[String],
                       qs: Seq[Double], s: Int = 16): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"bad quantiles $qs")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("qb"), col("sub"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols.map(col): _*)
    val lower = pow(lit(2.0), (col("qb") - 1).cast("double")).cast("long")
    val lo = when(col("qb") === 0, lit(0L))
      .otherwise(lower + floor(col("sub") * lower / s).cast("long"))
    val hi = when(col("qb") === 0, lit(1L))
      .otherwise(lower + floor(((col("sub") + 1) * lower + (s - 1)) / s).cast("long"))
    val sGuard = when(min(col("sk_s")).over(wAll) === s &&
      max(col("sk_s")).over(wAll) === s, lit(1))
      .otherwise(raise_error(lit(
        s"quantileEstimate: registers disagree with s=$s — built with different s")))
    val cum = registers
      .withColumn("_cum", sum(col("cnt")).over(wOrd) * sGuard)
      .withColumn("_n", sum(col("cnt")).over(wAll))
      .withColumn("_lo", lo).withColumn("_hi", hi)
    qs.map { q =>
      // the FIRST bucket whose cumulative count reaches rank ⌈q·n⌉: its
      // cum is >= the rank while (cum − cnt) is still below it
      val rank = ceil(col("_n") * q)
      cum.where(col("_cum") >= rank && (col("_cum") - col("cnt")) < rank)
        .select(keyCols.map(col) :+ lit(q).as("q") :+ col("_n").as("n") :+
          col("_lo").as("q_lo") :+ col("_hi").as("q_hi"): _*)
    }.reduce(_ unionByName _)
  }

  /** The paper's small-range correction (linear counting when the raw
    * estimate ≤ 5m/2 and some buckets are empty), applied to a
    * COLLECTED (hll_est, buckets_hit) pair on the driver — deliberately
    * OUTSIDE the expression contract: it needs `ln`, whose last-ulp
    * value is libm-specific, and [[hllEstimate]] promises cross-engine
    * bit-equality. Cardinalities far below m are exactly where the raw
    * estimator is badly biased (measured 5.6× high on ~30-distinct
    * sources at m=256), and exactly where linear counting over the
    * empty-bucket count is near-exact. */
  def correctedEstimate(rawEst: Double, bucketsHit: Long, p: Int): Double = {
    checkP(p)
    val m = 1 << p
    if (rawEst <= 2.5 * m && bucketsHit < m)
      m * math.log(m.toDouble / (m - bucketsHit))
    else rawEst
  }

  /** The k md5-carved bit positions of a Bloom filter (Bloom 1970,
    * "Space/Time Trade-offs in Hash Coding with Allowable Errors") — the
    * [[cmsBuckets]] carve mod m, shared by build and probe for the same
    * must-not-fork reason: a forked derivation would read set bits as
    * absent, a FALSE NEGATIVE, the one thing a Bloom filter must never
    * produce. */
  private def bloomBits(valueCol: String, k: Int, m: Int): Column =
    // literally the CMS carve — ONE shared derivation, so the must-not-fork
    // property is structural: a future hash change cannot diverge the two
    cmsBuckets(valueCol, d = k, w = m)

  /** The CHEAP bit derivation for Bloom filters whose bit layout is never
    * observed by an oracle or a merge partner: one codegen'd xxhash64 per
    * value, carved into k disjoint 16-bit chunks mod m — ~an order of
    * magnitude less per-row CPU than the md5 digest + hex-substring +
    * base-16 conv of [[bloomBits]]. The md5 form stays the PUBLIC sketch
    * derivation (cross-engine exact, oracle-mirrored in q_bloom_filter);
    * this one serves pure pre-filters ([[bloomRegistersXx]] /
    * [[bloomContainsXx]]) where only the no-false-negative property
    * matters and an exact verify kills the false positives downstream.
    * The 16-bit carve caps m at 2^16 (~8 KB packed) — enough for the
    * pre-filter role since the FP sliver is exact-verified anyway; callers
    * needing a bigger space must use the md5 register family. */
  private def xxBloomBits(valueCol: String, k: Int, m: Int): Column = {
    require(k >= 1 && k <= 4, s"xxhash64 carves at most 4 disjoint 16-bit chunks, got k=$k")
    require(m >= 2 && m <= (1 << 16), s"16-bit chunks address at most 2^16 bits, got m=$m")
    val h = xxhash64(col(valueCol))
    array((0 until k).map(i =>
      pmod(shiftrightunsigned(h, i * 16).bitwiseAND(lit(0xFFFFL)), lit(m.toLong))
        .cast("int")): _*)
  }

  /** [[bloomRegisters]] with the [[xxBloomBits]] derivation. Build and
    * probe must pair ([[bloomBitmapXx]]/[[bloomMaybePresentXx]]) — the
    * (k, m) guard columns do NOT distinguish the two hash families, so
    * mixing an md5-built frame with an xx probe would silently manufacture
    * false negatives. Kept package-private for exactly that reason; the one
    * caller is the decontamination pre-filter, whose output is
    * exact-verified. */
  private[llm] def bloomRegistersXx(items: DataFrame, keyCols: Seq[String],
                                    valueCol: String, k: Int = 4,
                                    m: Int = 1 << 16): DataFrame =
    items.select(keyCols.map(col) :+
        explode(xxBloomBits(valueCol, k, m)).as("bit"): _*)
      .distinct()
      .withColumn("sk_k", lit(k)).withColumn("sk_m", lit(m))

  /** An UNKEYED [[bloomRegistersXx]] frame packed into ONE dense-bitmap
    * row: `bloom_words` = ceil(m/64) longs, word w holding bits 64w..64w+63.
    * The relational register form is the mergeable, per-key sketch; this
    * is its SERVING form — a single broadcastable row (8 KB at m = 2^16)
    * against which [[bloomMaybePresentXx]] probes map-only: no explode,
    * no register join, no per-probe aggregation. Empty registers pack to
    * all-zero words (every probe correctly reads false). */
  private[llm] def bloomBitmapXx(registers: DataFrame, m: Int): DataFrame =
    registers
      .select(shiftright(col("bit"), 6).as("w"),
        // call_function: the Scala shiftleft/shiftrightunsigned wrappers
        // only take literal Int shift amounts; the SQL functions take columns
        call_function("shiftleft", lit(1L),
          col("bit").bitwiseAND(lit(63)).cast("int")).as("v"))
      .groupBy(col("w")).agg(bit_or(col("v")).as("word"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("word")))).as("_wm"))
      // ceil-sized word array: floor(m/64) dropped the final PARTIAL word
      // for 64 < m ≤ 2^16 with m % 64 != 0 — bits set there vanished at
      // build and the probe's out-of-bounds element_at read null → false,
      // i.e. silent FALSE NEGATIVES (the one thing a Bloom filter must
      // never produce). Covered by the m=100 pairing test.
      .select(transform(sequence(lit(0), lit((m + 63) / 64 - 1)),
        w => coalesce(element_at(col("_wm"), w), lit(0L))).as("bloom_words"))

  /** Map-only membership against a [[bloomBitmapXx]] row cross-joined onto
    * the probe stream: true iff ALL k carved bits are set — k O(1) array
    * indexes + bit tests per row, the whole corpus side stays in one
    * codegen'd map pass. Must pair with [[bloomRegistersXx]]-built words
    * (same xx derivation — the must-not-fork discipline, shared
    * structurally via [[xxBloomBits]]). */
  private[llm] def bloomMaybePresentXx(valueCol: String, k: Int, m: Int,
                                       wordsCol: String = "bloom_words"): Column =
    forall(xxBloomBits(valueCol, k, m), b =>
      call_function("shiftrightunsigned",
        element_at(col(wordsCol), (shiftright(b, 6) + 1).cast("int")),
        b.bitwiseAND(lit(63)).cast("int"))
        .bitwiseAND(lit(1L)) === 1L)

  /** Bloom MEMBERSHIP filter as a sparse register frame — the fourth
    * member of the sketch family (HLL = distinct, CMS = frequency,
    * quantile = rank): (keys..., bit, sk_k, sk_m), one row per bit
    * actually SET. Sparse relational form beats a packed bitmap here:
    * registers are bounded by min(k·|values|, m) rows per key, merge is
    * plain set UNION ([[bloomMerge]] — the bitmap OR, idempotent and
    * commutative, so re-appending a batch is harmless), and the whole
    * derivation is md5 integer arithmetic — cross-engine exact like its
    * three siblings. Membership ([[bloomContains]]) answers "possibly
    * present" with NO false negatives ever; false positives at rate
    * ≈ (1 − e^(−k·n/m))^k. The 100 TB role: a few-KB shippable
    * pre-filter — benchmark-contamination probes, spent-ref membership,
    * seen-URL checks — that prunes the expensive exact path without ever
    * wrongly pruning a real member. */
  def bloomRegisters(items: DataFrame, keyCols: Seq[String], valueCol: String,
                     k: Int = 4, m: Int = 1 << 16): DataFrame =
    items.select(keyCols.map(col) :+
        explode(bloomBits(valueCol, k, m)).as("bit"): _*)
      .distinct()
      .withColumn("sk_k", lit(k)).withColumn("sk_m", lit(m))

  /** Merge two Bloom register frames over the same key space: set union —
    * the bitmap OR. Build parameters are verified on every merged row
    * (the sketch family's both-directions discipline): a (k, m) mismatch
    * would silently turn probes into false negatives. */
  def bloomMerge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    foldRegisters(a.unionByName(b), keyCols, Seq("bit"),
      None, Seq("sk_k", "sk_m"), "bloomMerge")

  /** Membership probes: for each (key, value) probe row, `maybe_present`
    * is true iff ALL k of its bits are set in the register frame. The
    * guarantee is one-sided the safe way: a value that was EVER added
    * reads true (no false negatives); an absent value reads true only on
    * a k-fold bit collision. Registers join as a BROADCAST onto the probe
    * stream (bounded by min(k·n, m) rows per key). The (k, m) build/probe
    * mismatch guard works in both directions via the carried parameter
    * columns, with the bit bound as a backstop — a mismatch would
    * under-read set bits, manufacturing exactly the false negatives the
    * filter exists to rule out. An empty register frame is the legitimate
    * sketch of empty input: every probe correctly reads false. */
  def bloomContains(registers: DataFrame, probes: DataFrame, keyCols: Seq[String],
                    valueCol: String, k: Int = 4, m: Int = 1 << 16): DataFrame =
    bloomContainsBits(bloomBits(valueCol, k, m), registers, probes,
      keyCols, valueCol, k, m)

  /** The probe body, parameterized on the bit derivation so the md5 and
    * xxhash64 families share one implementation (each family's build/probe
    * pair passes the SAME derivation — the must-not-fork discipline). */
  private def bloomContainsBits(bits: Column, registers: DataFrame,
                                probes: DataFrame, keyCols: Seq[String],
                                valueCol: String, k: Int, m: Int): DataFrame = {
    val bounds = broadcast(registers.agg(
      coalesce(max(col("bit")), lit(-1)).as("_maxb"),
      coalesce(min(col("sk_k")), lit(k)).as("_kmin"),
      coalesce(max(col("sk_k")), lit(k)).as("_kmax"),
      coalesce(min(col("sk_m")), lit(m)).as("_mmin"),
      coalesce(max(col("sk_m")), lit(m)).as("_mmax")))
    // struct-wrapped key so the lookup is NULL-SAFE: a NULL-key group's
    // bits are in the registers (distinct/groupBy keep NULL keys) but a
    // bare-column join could never read them back — a NULL-key probe of a
    // present value read false, manufacturing exactly the false negative
    // the filter's guarantee rules out.
    probes.select(keyCols.map(col) :+ struct(keyCols.map(col): _*).as("_g") :+
        col(valueCol) :+
        explode(bits).as("bit"): _*)
      .join(broadcast(registers.select(
          struct(keyCols.map(col): _*).as("_g"), col("bit"))
        .withColumn("_set", lit(1))), Seq("_g", "bit"), "left_outer")
      .crossJoin(bounds)
      .select(keyCols.map(col) :+ col(valueCol) :+
        when(col("_kmin") === k && col("_kmax") === k &&
          col("_mmin") === m && col("_mmax") === m && col("_maxb") < m,
          coalesce(col("_set"), lit(0)))
          .otherwise(raise_error(lit(s"bloomContains: registers disagree with (k=$k, m=$m)" +
            " — built with different parameters"))).as("_set"): _*)
      .groupBy((keyCols :+ valueCol).map(col): _*)
      // min, not sum === k: "every bit present" must be insensitive to row
      // multiplicity — duplicate probe rows (2k exploded rows) and register
      // frames that were concatenated rather than bloomMerge'd (a set bit
      // fanning out to several join rows) would both break a sum-based
      // count and manufacture false negatives; min is immune to both
      .agg((min(col("_set")) === 1).as("maybe_present"))
  }
}
