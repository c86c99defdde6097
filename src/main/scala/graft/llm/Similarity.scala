package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * All arithmetic is an ORDERED sequential double fold over the array —
  * `aggregate(zip_with(...))` — which is whole-stage-codegen'd by Catalyst
  * and (verified empirically) bit-identical to DuckDB's
  * `list_cosine_similarity` on DOUBLE[], so oracle checks can hash-compare
  * floating-point scores exactly.
  *
  * Scale shape: the query vector (or the centroid set) is a broadcast-sized
  * dimension; the big side streams through one codegen stage with no shuffle
  * for brute force, and one hash-partitioned shuffle on `cell` for IVF. At
  * 100 TB the IVF variant reads only the probed cells if the table is
  * bucketed/partitioned by `cell` — that's the point of the design. */
object Similarity {

  /** dot(a, b) as an ordered fold; inputs are cast elementwise to double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0),
      (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one query vector: no shuffle — the
    * query row is crossed in as a broadcast single-row dimension, scores are
    * computed in one codegen span, and only the global top-k ordering
    * reduces (TakeOrderedAndProject). */
  def bruteForceTopK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    // query norm computed ONCE in the broadcast row, not per scanned row
    // (norm is a full array fold — hoisting it halves the per-row work);
    // sqrt(a)·sqrt(b) is the same float expression either way, so scores
    // stay bit-identical to the two-sided form
    val q = broadcast(
      embeddings.where(col("vec_id") === queryVecId)
        .select(col("embedding").as("qe"), norm(col("embedding")).as("qn")))
    embeddings.where(col("vec_id") =!= queryVecId)
      .crossJoin(q)
      .select(col("vec_id"),
        (dot(col("embedding"), col("qe")) / (norm(col("embedding")) * col("qn"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Dimension-budget recall report — the Matryoshka-style truncation
    * evaluation (Kusupati et al., "Matryoshka Representation Learning",
    * NeurIPS 2022): for each candidate prefix width `d`, how many of the
    * full-dimension top-k nearest neighbors survive when ranking by only
    * the first `d` components. This is the design report behind shrinking
    * a 100 TB vector scan: if recall holds at d=16 of 64, the ANN index
    * stores (and the brute-force stage streams) a quarter of the bytes.
    *
    * Output: one row per width — (dim, hits ∈ 0..k, k); exact integers
    * (both rankings are the bit-deterministic [[bruteForceTopK]] ordering,
    * so the overlap is engine-exact). The per-width scans share the
    * broadcast-query map-only shape; the k×k overlap join is trivially
    * broadcast. |dims| is a handful, so the unioned plan stays small. */
  def truncatedRecall(embeddings: DataFrame, dims: Seq[Int],
                      queryVecId: Long, k: Int): DataFrame = {
    require(dims.nonEmpty, "no widths to evaluate")
    val full = bruteForceTopK(embeddings, queryVecId, k).select(col("vec_id"))
    dims.map { d =>
      // execution guard: slice() silently CLAMPS to the array length, so a
      // width wider than the stored embedding would emit a trivially-perfect
      // hits=k row for a truncation that was never evaluated — misleading
      // for exactly the byte-budget decision this report drives. Fail loudly
      // instead (the raise_error discipline of the sketch family).
      val trunc = embeddings.select(col("vec_id"),
        when(size(col("embedding")) >= d, slice(col("embedding"), 1, d))
          .otherwise(raise_error(lit(
            s"truncatedRecall: width $d exceeds the stored embedding dimension")))
          .as("embedding"))
      bruteForceTopK(trunc, queryVecId, k).select(col("vec_id"))
        .join(broadcast(full), Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(d).as("dim"), col("hits"), lit(k.toLong).as("k"))
    }.reduce(_ unionByName _)
  }

  /** Assign every vector to its nearest centroid (max cosine — or min
    * squared L2 with `metric = "l2"` — centroid id as tie-break).
    * `centroids` must be broadcast-sized (IVF coarse quantizer: hundreds to
    * ~64k cells). Output: input columns + `cell`.
    *
    * MAP-ONLY: the whole centroid set is collapsed into ONE broadcast row
    * holding `array<struct<centroid_id, ce>>`, crossed into the scan, and the
    * argmax is a per-row `array_max` over a `transform` of that array —
    * `max(struct(score, -id))` picks the best score with lowest-id
    * tie-break. The embedding payload NEVER moves: no hash shuffle anywhere
    * in the plan (the only exchange is the O(k)-row SinglePartition collect
    * that builds the broadcast row on the centroid side). At 100 TB each
    * k-means iteration / IVF build reads the vectors in place. Per-pair
    * `cosine` is the same expression tree as before, so assignments (and
    * their float ties) are bit-identical to the former join+groupBy plan. */
  def assignCells(embeddings: DataFrame, centroids: DataFrame,
                  metric: String = "cosine"): DataFrame = {
    val centRow = broadcast(centroids
      .agg(collect_list(struct(col("centroid_id"), col("centroid").as("ce"))).as("cents")))
    def score(ce: Column): Column = metric match {
      case "cosine" => cosine(col("embedding"), ce)
      case "l2"     => -l2sq(col("embedding"), ce) // argmax(-d²) = argmin d²
      case other    => throw new IllegalArgumentException(s"unknown metric $other")
    }
    embeddings.crossJoin(centRow)
      .withColumn("cell",
        -array_max(transform(col("cents"), c =>
          struct(score(c.getField("ce")).as("s"),
                 (-c.getField("centroid_id")).as("nid"))))
          .getField("nid"))
      .drop("cents")
  }

  /** IVF index-health report — the cell-balance diagnostic a deployment
    * monitors: per cell, its population and its nearest / median / farthest
    * member by squared-L2 distance to the centroid (one row per (cell,
    * role)). Skewed populations kill partition pruning (one hot cell ≈ a
    * full scan for every query probing it) and a farthest-member distance
    * drifting up says the quantizer needs retraining — this report is the
    * trigger for both. Median is picked by RANK (row ceil(n/2) of the
    * cell-sorted distances — the lengthQuantiles discipline), and min/max/
    * rank picks of bit-identical doubles are order-free, so every value is
    * engine-exact; roles collide onto the same row when n is small (n = 1
    * emits the same member three times — by design, the report is always
    * 3 rows per cell).
    *
    * Scale shape: the distance pass is the map-only broadcast-centroid
    * shape ([[residuals]]); then ONE cell-keyed exchange feeds the ranking
    * window — the same partitioning the index is stored under, so on the
    * persisted index this is a per-partition scan with no extra shuffle. */
  def ivfCellStats(assigned: DataFrame, centroids: DataFrame): DataFrame = {
    val centRow = broadcast(centroids
      .agg(collect_list(struct(col("centroid_id"), col("centroid").as("ce"))).as("cents")))
    val d = assigned.crossJoin(centRow)
      .select(col("vec_id"), col("cell"),
        l2sq(col("embedding"),
          element_at(filter(col("cents"),
            c => c.getField("centroid_id") === col("cell")), 1).getField("ce"))
          .as("dist"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
    d.withColumn("rk", row_number().over(w.orderBy(col("dist"), col("vec_id"))))
      .withColumn("n", count(lit(1)).over(w))
      .select(col("cell"), col("vec_id"), col("dist"), col("rk"), col("n"),
        explode(array(
          struct(lit("nearest").as("role"), lit(1L).as("target")),
          struct(lit("median").as("role"),
            ((col("n") + 1) / 2).cast("long").as("target")),
          struct(lit("farthest").as("role"), col("n").as("target")))).as("r"))
      .where(col("rk") === col("r.target"))
      .select(col("cell"), col("r.role").as("role"), col("vec_id"),
        col("dist"), col("n"))
  }

  /** IVF search: probe only the `nprobe` cells nearest to the query vector,
    * then brute-force within the probed subset. With the index table
    * partitioned by `cell`, the scan touches ~nprobe/|cells| of the data.
    * `metric` must match how `assigned` was built ([[assignCells]]):
    * cosine ranks descending similarity (`cos_sim`), l2 ranks ascending
    * squared distance (`l2_dist`). */
  def ivfTopK(assigned: DataFrame, centroids: DataFrame,
              queryVecId: Long, k: Int, nprobe: Int,
              metric: String = "cosine"): DataFrame = metric match {
    case "cosine" =>
      // query norm hoisted into the broadcast row (see bruteForceTopK)
      val q = broadcast(
        assigned.where(col("vec_id") === queryVecId)
          .select(col("embedding").as("qe"), norm(col("embedding")).as("qn")))
      val probedCells = broadcast(
        centroids.crossJoin(q)
          .select(col("centroid_id"),
            (dot(col("centroid"), col("qe")) / (norm(col("centroid")) * col("qn"))).as("sim"))
          .orderBy(col("sim").desc, col("centroid_id"))
          .limit(nprobe)
          .select(col("centroid_id").as("cell")))
      assigned.where(col("vec_id") =!= queryVecId)
        .join(probedCells, Seq("cell"), "left_semi") // partition-prunable at scale
        .crossJoin(q)
        .select(col("vec_id"), col("cell"),
          (dot(col("embedding"), col("qe")) / (norm(col("embedding")) * col("qn"))).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(k)
    case "l2" =>
      val q = broadcast(
        assigned.where(col("vec_id") === queryVecId)
          .select(col("embedding").as("qe")))
      val probedCells = broadcast(
        centroids.crossJoin(q)
          .select(col("centroid_id"), l2sq(col("centroid"), col("qe")).as("dist"))
          .orderBy(col("dist"), col("centroid_id"))
          .limit(nprobe)
          .select(col("centroid_id").as("cell")))
      assigned.where(col("vec_id") =!= queryVecId)
        .join(probedCells, Seq("cell"), "left_semi")
        .crossJoin(q)
        .select(col("vec_id"), col("cell"), l2sq(col("embedding"), col("qe")).as("l2_dist"))
        .orderBy(col("l2_dist"), col("vec_id"))
        .limit(k)
    case other => throw new IllegalArgumentException(s"unknown metric $other")
  }

  /** Train the IVF coarse quantizer: spherical k-means via Lloyd
    * iterations, entirely as DataFrame ops. Initialization is
    * DETERMINISTIC — the k lowest vec_ids seed the centroids (callers
    * wanting k-means++-style spread can pre-shuffle ids by a hash).
    * Per iteration:
    *   assign: per-row argmax over the broadcast centroid array
    *     (`assignCells`) — map-only, nothing moves;
    *   update: posexplode components → groupBy (cell, pos) avg → re-zip
    *     in position order. The component shuffle carries (cell, pos, v)
    *     doubles with map-side partial aggregation — O(n·dim) adds,
    *     O(k·dim) rows out, independent of vector payload layout.
    * Each round materializes via localCheckpoint: iterative lineage
    * otherwise compounds the plan until the driver chokes (same discipline
    * as Dedup's label propagation). Empty cells keep their previous
    * centroid (standard Lloyd degeneracy handling).
    *
    * DETERMINISM: by default the `avg` update is a distributed double
    * partial aggregation, so centroid values depend on partition summation
    * order — unlike the repo's hash-gated paths (integer TF-IDF,
    * ordered-fold cosine). Do NOT put default-mode centroids behind a
    * cross-engine hash-compare gate; assignments derived from FIXED
    * centroids (the oracle-gated queries) stay bit-deterministic either
    * way. `deterministic = true` switches the update to a sorted sequential
    * fold — `collect_list` per (cell, component), `array_sort`, then an
    * ordered `aggregate` — which is bit-reproducible across runs, partition
    * layouts, and engines, at the cost of materializing each component's
    * value list in the aggregation (fine for broadcast-sized k·dim groups;
    * the list length is the cell population, so prefer the default for
    * billion-vector cells and gate on assignments instead). */
  def kmeansCentroids(embeddings: DataFrame, k: Int, iters: Int,
                      deterministic: Boolean = false,
                      metric: String = "cosine"): DataFrame = {
    // seed ids 1..k by vec_id order WITHOUT a global rank window: the
    // limit(k) frame is k rows, so coalesce it to one partition, sort
    // within it, and read the partition-local row counter — same ids,
    // no WindowExec unpartitioned-window warning flooding the logs
    var centroids = embeddings
      .orderBy(col("vec_id")).limit(k)
      .coalesce(1).sortWithinPartitions(col("vec_id"))
      .select((monotonically_increasing_id() + 1L).as("centroid_id"),
        col("embedding").as("centroid"))
      .localCheckpoint(true)
    (0 until iters).foreach { _ =>
      val assigned = assignCells(embeddings, centroids, metric)
      // the mean of each (cell, component): order-free distributed avg, or a
      // sorted sequential fold when bit-reproducibility is required
      val mean: Column =
        if (deterministic)
          aggregate(array_sort(collect_list(col("v").cast("double"))),
            lit(0.0), (acc, v) => acc + v) / count(lit(1))
        else avg(col("v").cast("double"))
      val updated = assigned
        .select(col("cell").as("centroid_id"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(mean.as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          p => p.getField("m").cast("float")).as("centroid"))
      // empty cells vanish from `updated`: keep their previous centroid
      centroids = centroids.select(col("centroid_id"), col("centroid").as("prev"))
        .join(updated, Seq("centroid_id"), "left_outer")
        .select(col("centroid_id"), coalesce(col("centroid"), col("prev")).as("centroid"))
        .localCheckpoint(true)
    }
    centroids
  }

  /** Squared L2 distance as an ordered sequential double fold (same
    * bit-determinism discipline as [[dot]]/[[cosine]]): d² = Σ (aᵢ−bᵢ)²
    * accumulated left-to-right. Squares are ≥ +0.0, so the fold's 0.0 seed
    * never flips a sign bit and the result is reproducible in any engine
    * that folds sequentially. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0),
      (acc, v) => acc + v)

  /** Scalar int8 quantization with per-dimension min/max calibration — the
    * standard embedding-compression step before a large-scale vector scan
    * (4× smaller than float32; dot products move to integer SIMD). Two
    * passes, both scale-safe: (1) CALIBRATE — posexplode to (dim, value)
    * and aggregate per-dimension min/max (partial map-side combine; the
    * shuffle carries ≤ dims rows per partition), then fold the dims-row
    * result into ONE ordered-array row; (2) QUANTIZE — broadcast that
    * single calibration row against the corpus and map each component to
    * `floor((v − mn)/((mx − mn)/255) + 0.5)` clamped to [0, 255], as a
    * codegen'd higher-order projection (payloads never shuffle). The
    * arithmetic is plain IEEE-double, so an external engine recomputes the
    * codes bit-identically from the same definition; a constant dimension
    * (mx = mn) quantizes to 0 rather than dividing by zero. */
  def quantizeInt8(emb: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    emb.crossJoin(broadcast(int8Calib(emb, vecCol)))
      .select(col(idCol), int8CodeCol(vecCol).as("qvec"))

  /** One-row (mns, mxs) per-dimension calibration frame: the dim-keyed
    * min/max aggregate combines map-side (≤ dims rows cross the shuffle per
    * partition), then folds into ordered arrays so the quantize pass can
    * broadcast a single row. */
  private def int8Calib(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "v")))
      .groupBy(col("i")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .groupBy().agg(
        expr("transform(array_sort(collect_list(struct(i, mn))), x -> x.mn)").as("mns"),
        expr("transform(array_sort(collect_list(struct(i, mx))), x -> x.mx)").as("mxs"))

  /** The per-component code map against in-scope `mns`/`mxs` arrays. */
  private def int8CodeSql(vecCol: String): String =
    s"""transform(sequence(0, size($vecCol) - 1), i ->
       |  CASE WHEN mxs[i] = mns[i] THEN 0 ELSE
       |    CAST(least(255.0D, greatest(0.0D,
       |      floor((CAST(element_at($vecCol, i + 1) AS DOUBLE) - mns[i])
       |            / ((mxs[i] - mns[i]) / 255.0D) + 0.5D))) AS INT)
       |  END)""".stripMargin
  private def int8CodeCol(vecCol: String): Column = expr(int8CodeSql(vecCol))

  /** Per-dimension ZERO-POINT: the code of 0.0 under the same map (clamped
    * like any other value; 0 on constant dims). Centering codes on it
    * before the dot removes the affine shift the unsigned code range
    * introduces — without it the score is dominated by Σa + Σb, not a·b. */
  private val int8ZeroCol: Column =
    expr("""zip_with(mns, mxs, (mn, mx) ->
           |  CASE WHEN mx = mn THEN 0 ELSE
           |    CAST(least(255.0D, greatest(0.0D,
           |      floor((0.0D - mn) / ((mx - mn) / 255.0D) + 0.5D))) AS INT)
           |  END)""".stripMargin)

  /** Top-k search OVER THE INT8 CODES: integer dot product between
    * ZERO-POINT-CENTERED codes — the compressed-domain scan
    * [[quantizeInt8]] exists to serve (4× less IO than float32). Centering
    * each component on the code of 0.0 (see `int8ZeroCol`) makes
    * `(a−z)·(b−z)` a faithful estimate of the float dot up to the per-dim
    * scale weighting; the raw unsigned codes would score `Σa + Σb`
    * instead of `a·b`. Scores stay EXACT integers (|each term| ≤ 255², so
    * ≤ dims·255² total), ranking is bit-deterministic, and an external
    * engine reproduces it hash-exactly — no float tolerance. The
    * single-row centered-query frame broadcasts; the scan is one codegen'd
    * projection + a global top-k (TakeOrderedAndProject: per-partition
    * heaps, k rows to the driver — no full sort, no payload shuffle).
    * Like every quantized scan it is an APPROXIMATION of the float
    * ranking — a deployment reranks the short-list with float vectors,
    * exactly like [[ivfPqTopKRerank]]. */
  def quantizedTopK(emb: DataFrame, queryVecId: Long, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    quantizedTopKFromCodes(centeredInt8Codes(emb, idCol, vecCol), queryVecId, k, idCol)

  /** (id, cvec) zero-point-centered code frame — the persisted artifact of
    * the compressed index: a deployment calibrates once, writes this column
    * to parquet at ingest, and every scan reads codes only (like the PQ
    * code frames). The composed [[quantizedTopK]] recomputes the
    * calibration subtree per consumer; cache (or write) this frame before
    * fanning it out. */
  def centeredInt8Codes(emb: DataFrame, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame =
    emb.crossJoin(broadcast(
        int8Calib(emb, vecCol).select(col("mns"), col("mxs"), int8ZeroCol.as("zs"))))
      .select(col(idCol),
        expr(s"zip_with(${int8CodeSql(vecCol)}, zs, (a, z) -> a - z)").as("cvec"))

  /** The scan half of [[quantizedTopK]], over an already-built (id, cvec)
    * code frame. */
  def quantizedTopKFromCodes(centered: DataFrame, queryVecId: Long, k: Int,
                             idCol: String = "vec_id"): DataFrame = {
    val q = centered.where(col(idCol) === queryVecId)
      .select(col("cvec").as("q_cvec"))
    centered.where(col(idCol) =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        expr("aggregate(zip_with(cvec, q_cvec, (a, b) -> CAST(a AS BIGINT) * b), CAST(0 AS BIGINT), (acc, v) -> acc + v)")
          .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Product-quantization codebook from fixed corpus vectors: the embedding
    * splits into `m` contiguous `subDim`-wide subvectors and each subspace
    * gets one codeword per (vec_id → code_id) entry — the deterministic
    * analogue of per-subspace k-means (swap in trained codewords the same
    * way [[kmeansCentroids]] feeds [[assignCells]]). Output:
    * (sub, code_id, cw) — m × |codewords| rows, always broadcast-sized. */
  def pqCodebook(embeddings: DataFrame, codewords: Seq[(Long, Int)],
                 m: Int, subDim: Int): DataFrame = {
    val codeOf = codewords.tail.foldLeft(
        when(col("vec_id") === codewords.head._1, codewords.head._2)) {
      case (acc, (vid, cid)) => acc.when(col("vec_id") === vid, cid)
    }
    embeddings.where(col("vec_id").isin(codewords.map(_._1): _*))
      .select(codeOf.as("code_id"), col("embedding"))
      .select(col("code_id"), explode(sequence(lit(0), lit(m - 1))).as("sub"), col("embedding"))
      .select(col("sub"), col("code_id"),
        slice(col("embedding"), col("sub") * subDim + 1, lit(subDim)).as("cw"))
  }

  /** TRAIN PQ codebooks: per-subspace k-means over the sliced subvectors —
    * [[kmeansCentroids]] with the L2 metric (PQ quantizes by squared
    * Euclidean distance, so training must assign the same way; a
    * cosine-trained codebook would systematically mis-center the cells
    * [[pqEncode]] later carves by L2). `m` sequential k-means runs, each
    * over an (id, subvector) projection — the heavy per-iteration work is
    * still the map-only assignment, so the payload never shuffles. Output
    * matches [[pqCodebook]]: (sub, code_id, cw). Same determinism caveats
    * as [[kmeansCentroids]]. */
  def pqTrainCodebook(embeddings: DataFrame, m: Int, subDim: Int,
                      ks: Int, iters: Int,
                      deterministic: Boolean = false): DataFrame =
    (0 until m).map { s =>
      kmeansCentroids(
        embeddings.select(col("vec_id"),
          slice(col("embedding"), lit(s * subDim + 1), lit(subDim)).as("embedding")),
        ks, iters, deterministic, metric = "l2")
        .select(lit(s).as("sub"), col("centroid_id").cast("int").as("code_id"),
          col("centroid").as("cw"))
    }.reduce(_ unionByName _)

  /** The per-subspace nearest-codeword columns shared by [[pqEncode]] and
    * [[ivfPqEncode]]: expects the broadcast codebook row (`cbs`) to be in
    * scope; argmin(d², code_id) = −max(−d², −code_id) — highest −d² is the
    * smallest distance, and on exact float ties the largest −code_id is the
    * smallest code id. */
  private def pqCodeColumns(vec: Column, m: Int, subDim: Int): Seq[Column] =
    (0 until m).map { s =>
      val subVec = slice(vec, lit(s * subDim + 1), lit(subDim))
      (-array_max(transform(filter(col("cbs"), c => c.getField("sub") === s),
        c => struct((-l2sq(subVec, c.getField("cw"))).as("nd"),
                    (-c.getField("code_id")).as("nid"))))
        .getField("nid")).cast("int").as(s"c$s")
    }

  /** PQ encode — the compression step of IVF-PQ-style ANN: every vector
    * becomes `m` small integer codes (nearest codeword per subspace by
    * squared L2, lowest code_id on ties). This is what makes 100 TB of
    * vectors searchable from RAM: dim·4 bytes collapse to m codes and the
    * payload never needs re-reading at query time.
    *
    * MAP-ONLY (the [[assignCells]] shape): the whole codebook collapses into
    * ONE broadcast row of `array<struct<sub, code_id, cw>>` and each argmin
    * is a per-row `array_max` over the filtered subspace — the embedding
    * payload never shuffles. Output: (vec_id, c0..c{m-1}). */
  def pqEncode(embeddings: DataFrame, codebook: DataFrame,
               m: Int, subDim: Int): DataFrame = {
    val cbRow = broadcast(codebook
      .agg(collect_list(struct(col("sub"), col("code_id"), col("cw"))).as("cbs")))
    embeddings.crossJoin(cbRow)
      .select(col("vec_id") +: pqCodeColumns(col("embedding"), m, subDim): _*)
  }

  /** Residual of every assigned vector against its cell centroid —
    * rᵢ = xᵢ − c(cell(xᵢ)), the quantity IVF-PQ compresses (residuals
    * cluster much tighter than raw vectors, so the same code budget buys
    * far more precision; Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011, §IV).
    *
    * MAP-ONLY: the centroid set collapses into ONE broadcast row and the
    * subtraction is a per-row `zip_with` against the matching entry — the
    * payload never shuffles. Elementwise float→double subtraction is exact,
    * so residuals are bit-reproducible in any engine.
    * Output: (vec_id, cell, residual: array<double>). */
  def residuals(assigned: DataFrame, centroids: DataFrame): DataFrame = {
    val centRow = broadcast(centroids
      .agg(collect_list(struct(col("centroid_id"), col("centroid").as("ce"))).as("cents")))
    assigned.crossJoin(centRow)
      .select(col("vec_id"), col("cell"),
        zip_with(col("embedding"),
          element_at(filter(col("cents"),
            c => c.getField("centroid_id") === col("cell")), 1).getField("ce"),
          (x, y) => x.cast("double") - y.cast("double")).as("residual"))
  }

  /** IVF-PQ encode: PQ codes over the RESIDUAL (vector − assigned centroid)
    * instead of the raw vector, keeping the coarse `cell` alongside the
    * codes — the persisted index a deployment partitions by cell. Both the
    * residual and the code argmins are per-row broadcast shapes, so the
    * whole encode is MAP-ONLY. Output: (vec_id, cell, c0..c{m-1}). */
  def ivfPqEncode(assigned: DataFrame, centroids: DataFrame, codebook: DataFrame,
                  m: Int, subDim: Int): DataFrame = {
    val cbRow = broadcast(codebook
      .agg(collect_list(struct(col("sub"), col("code_id"), col("cw"))).as("cbs")))
    residuals(assigned, centroids).crossJoin(cbRow)
      .select(col("vec_id") +: col("cell") +: pqCodeColumns(col("residual"), m, subDim): _*)
  }

  /** INCREMENTAL maintenance of the persisted cell-partitioned IVF-PQ
    * index: coarse-assign + residual-encode ONE ingest batch (the whole
    * derivation is map-only — no shuffle per micro-batch) and APPEND it
    * under the existing `cell=` partition directories. The index never
    * rebuilds on ingest: new vectors land as new files inside their cell
    * partitions, so cell-pruned ADC readers (`spark.read.parquet(indexDir)
    * .where(cell isin probed)`) see them on the next scan, with file
    * pruning intact. Designed for `writeStream.foreachBatch` — which is
    * also where a deployment periodically re-trains centroids/codebooks
    * offline and swaps the whole index dir, the same manifest-swap
    * discipline the kupo index uses for rollback. */
  def ivfPqAppend(batch: DataFrame, centroids: DataFrame, codebook: DataFrame,
                  m: Int, subDim: Int, indexDir: String): Unit =
    ivfPqEncode(assignCells(batch, centroids, metric = "l2"),
        centroids, codebook, m, subDim)
      .write.mode("append").partitionBy("cell").parquet(indexDir)

  /** Compact a streaming-appended IVF-PQ index: micro-batch appends leave
    * one small file per batch per cell, and at 100 TB the file-listing and
    * per-file open cost eventually dominates the cell-pruned ADC scan
    * (the classic small-files problem). Rewrite every cell into ONE file —
    * `repartition(cell)` puts each cell wholly in one task, so
    * `partitionBy(cell)` emits exactly one file per cell directory — then
    * swap the rewritten tree in. Rows are bit-identical, only the file
    * layout changes; the ANN twin of the kupo index's optimize/vacuum.
    *
    * The swap runs the shared [[graft.index.AtomicSwap]] work/trash
    * discipline — the SAME crash-recovery rules as the kupo manifest commit
    * and the curation sinks' folds, not a private variant: the rewrite
    * stages in `.compacting`, the live tree renames aside into
    * `.compacting.trash`, one rename publishes, the trash deletes; a crash
    * at any point heals on the next invocation (work dir surviving ⇒
    * restore the original, trash alone ⇒ finish the cleanup). A deployment
    * doing live reads swaps a manifest pointer instead (the discipline
    * `GraftIndex.copyDatabase` rehearses); this is the offline form. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, indexDir: String): Unit = {
    // swaps go through the Hadoop FileSystem resolved from the path — works
    // on any scheme the index might live on (file://, hdfs://, s3a://, ...),
    // where java.nio would only ever see the local disk
    val dst = new org.apache.hadoop.fs.Path(indexDir)
    val work = new org.apache.hadoop.fs.Path(indexDir + ".compacting")
    val trash = new org.apache.hadoop.fs.Path(indexDir + ".compacting.trash")
    val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
    // LEGACY heal (one release): the pre-AtomicSwap revision of this method
    // renamed the live tree aside to `<indexDir>.old` before publishing —
    // an index that crashed mid-swap under THAT code has its data stranded
    // at `.old` with `indexDir` missing, a layout the shared heal below
    // does not recognize. Restore it first; once no `.old` dirs remain in
    // the wild this block can be dropped.
    val legacyOld = new org.apache.hadoop.fs.Path(indexDir + ".old")
    if (!fs.exists(dst) && fs.exists(legacyOld))
      require(fs.rename(legacyOld, dst),
        s"compactIndex: legacy recovery rename $legacyOld -> $dst failed")
    graft.index.AtomicSwap.heal(fs, work, trash, dst.getParent, "compactIndex")
    spark.read.parquet(indexDir)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(work.toString)
    graft.index.AtomicSwap.publishDir(fs, work, dst, trash, Seq(dst), "compactIndex")
  }

  /** The ADC distance tables as ONE broadcast row holding a DENSE double
    * array: entries sorted by the composite key (`keyCols` ++ (sub, code)),
    * projected down to just `d`, plus the two scalars (`ks` codewords per
    * subspace, `cmin` lowest code id) that turn a candidate's codes into
    * array ordinals. Lookups become pure-arithmetic `element_at` — O(1) per
    * subspace instead of the former O(|table|) `filter` scan, which at
    * production parameters (ks=256, m=16, nprobe=32) was ~2M struct
    * compares per candidate. REQUIRES contiguous code ids
    * (cmin..cmin+ks-1) — true of both [[pqCodebook]] (caller-supplied
    * dense ids) and [[pqTrainCodebook]] (row_number'd 1..ks). */
  private def denseAdcTable(entries: DataFrame, keyCols: Seq[String]): DataFrame = {
    // `probe_keys` rides in the SAME aggregate row: the sorted distinct
    // leading keys, each with its 0-based block rank — the candidate side
    // reads its block ordinal (and, batch form, its query fan-out) straight
    // off the broadcast row instead of through a row_number window plus a
    // broadcast join per reference (r14: that window+join pair was 3-4 AQE
    // stage-jobs per ANN query). Sorted structs = the same lexicographic
    // (keyCols...) order the dense `tbl` blocks are laid out in, so the
    // ranks are identical to the former window's by construction.
    val aggs = Seq(
      transform(
        array_sort(collect_list(struct(
          (keyCols ++ Seq("sub", "code_id")).map(col) :+ col("d"): _*))),
        t => t.getField("d")).as("tbl"),
      countDistinct(col("code_id")).cast("int").as("ks"),
      min(col("code_id")).cast("int").as("cmin")) ++
      (if (keyCols.isEmpty) Nil
       else Seq(transform(
           array_sort(collect_set(struct(keyCols.map(col): _*))),
           (k, i) => struct(k.as("key"), i.cast("int").as("rank0"))).as("probe_keys")))
    entries.agg(aggs.head, aggs.tail: _*)
  }

  /** Sum of the m per-subspace ADC lookups against a [[denseAdcTable]]:
    * `blockRank0` is the candidate's 0-based rank within the table's sorted
    * leading key (0 for the single-block PQ table) — each lookup is one
    * arithmetic `element_at`. Fixed s = 0..m-1 left-assoc sum keeps scores
    * bit-identical to the former filter-scan lookups. */
  private def adcSum(blockRank0: Column, m: Int): Column =
    (0 until m).map { s =>
      element_at(col("tbl"),
        ((blockRank0 * m + s) * col("ks") + col(s"c$s") - col("cmin") + 1).cast("int"))
    }.reduce(_ + _)

  /** IVF-PQ ADC top-k — the composed 100 TB ANN query: probe the `nprobe`
    * cells nearest the query (squared L2 to the coarse centroids), build a
    * PER-CELL asymmetric-distance table from the query's residual against
    * that cell's centroid (nprobe × m × |codewords| entries, one broadcast
    * dense-array row), and score candidates in probed cells by m O(1)
    * arithmetic lookups — the candidate scan reads ONLY
    * (vec_id, cell, c0..c{m-1}), never the vector payload. The probed-cell
    * set joins in as a broadcast dimension carrying each cell's rank in the
    * table (each candidate matches at most one probed cell, so the inner
    * broadcast join keeps exactly the left-semi rows and stays
    * partition-prunable: ~nprobe/|cells| of the files at scale). Fixed
    * s = 0..m-1 left-assoc lookup sum keeps ADC scores bit-reproducible;
    * ties break on vec_id. */
  def ivfPqTopK(encoded: DataFrame, centroids: DataFrame, codebook: DataFrame,
                query: DataFrame, queryVecId: Long, k: Int, nprobe: Int,
                m: Int, subDim: Int): DataFrame = {
    val q = broadcast(query.select(col("embedding").as("qe")))
    // NOTE (r14, measured): materializing this nprobe-row frame with an
    // eager localCheckpoint to deduplicate the two references below was
    // tried and REVERTED — the duplicated subtree's stages are tiny
    // broadcasts that run CONCURRENTLY inside the main job DAG, while the
    // checkpoint serializes extra jobs ahead of it (q_ann_ivfpq 15→19
    // jobs, 0.98→0.99 s; the batch variants regressed 0.3-0.5 s each).
    val probed = broadcast(
      centroids.crossJoin(q)
        .select(col("centroid_id").as("cell"), col("centroid"),
          l2sq(col("centroid"), col("qe")).as("dist"))
        .orderBy(col("dist"), col("cell"))
        .limit(nprobe))
    // per-cell query residual, then its distance to every codeword: the
    // whole table is one broadcast dense-array row keyed by (cell, sub, code)
    val qres = probed.crossJoin(q)
      .select(col("cell"),
        zip_with(col("qe"), col("centroid"),
          (x, y) => x.cast("double") - y.cast("double")).as("qr"))
    val tblRow = broadcast(denseAdcTable(
      codebook.crossJoin(qres)
        .select(col("cell"), col("sub"), col("code_id"),
          l2sq(slice(col("qr"), col("sub") * subDim + 1, lit(subDim)), col("cw")).as("d")),
      keyCols = Seq("cell")))
    // each probed cell's 0-based rank in the dense table's cell-sorted
    // order comes off the broadcast row itself (denseAdcTable.probe_keys):
    // a null lookup means the candidate's cell was not probed — exactly
    // the rows the former inner join on the nprobe-row dimension dropped —
    // and the window + broadcast join that dimension needed are gone
    encoded.where(col("vec_id") =!= queryVecId)
      .crossJoin(tblRow)
      .withColumn("cell_rank0",
        element_at(map_from_entries(col("probe_keys")), struct(col("cell"))))
      .where(col("cell_rank0").isNotNull)
      .select(col("vec_id") +: col("cell") +: (0 until m).map(s => col(s"c$s"))
        :+ adcSum(col("cell_rank0"), m).as("adc"): _*)
      .orderBy(col("adc"), col("vec_id"))
      .limit(k)
  }

  /** PQ asymmetric-distance (ADC) top-k: the query stays un-quantized; its
    * squared L2 to every codeword is computed ONCE into an m×|codewords|
    * distance table (one broadcast row), and each candidate's approximate
    * distance is m table lookups summed in fixed subspace order — no
    * per-pair vector arithmetic at all, the scan reads only the integer
    * codes. TakeOrderedAndProject reduces the top-k; ties break on vec_id. */
  def pqAdcTopK(encoded: DataFrame, codebook: DataFrame, query: DataFrame,
                queryVecId: Long, k: Int, m: Int, subDim: Int): DataFrame = {
    val tblRow = broadcast(denseAdcTable(
      codebook.crossJoin(query.select(col("embedding").as("qe")))
        .select(col("sub"), col("code_id"),
          l2sq(slice(col("qe"), col("sub") * subDim + 1, lit(subDim)), col("cw")).as("d")),
      keyCols = Seq.empty))
    encoded.where(col("vec_id") =!= queryVecId)
      .crossJoin(tblRow)
      .select(col("vec_id") +: (0 until m).map(s => col(s"c$s"))
        :+ adcSum(lit(0), m).as("adc"): _*)
      .orderBy(col("adc"), col("vec_id"))
      .limit(k)
  }

  /** Two-stage IVF-PQ: ADC SHORTLIST of `c` candidates from the code index,
    * then EXACT re-rank of only those `c` rows against the raw vectors —
    * the standard production refinement (Jégou et al. §V-A). ADC scores
    * drift across probed cells (each cell re-anchors the query residual,
    * mixing per-cell error floors — measured in LlmScaleRehearsal), and
    * the re-rank removes exactly that drift: the final top-k is exact
    * within the shortlist. DRIVER-FREE: the c-row shortlist frame joins
    * back as a broadcast left-semi (one job, no collect on the hot path);
    * with the payload table partitioned/bucketed alongside the index the
    * semi join's read stays bounded by the probed cells, and a serving
    * layer that wants row-group pruning can still materialize the ids —
    * the operator itself never does. */
  /** MEASURED DEFAULT operating points for the composed two-stage
    * retrieval, picked from the recall-vs-cost curve the rehearsal records
    * and floor-gates every round (SCALE.md Appendix B): on both rehearsal
    * scales the re-rank width c — not the probe count — is the recall
    * lever (every nprobe row of the curve converges at each c; coverage
    * ceiling is 1.0, cross-cell ADC drift is the limiter and the exact
    * re-rank absorbs it). So the defaults probe a QUARTER of the cells
    * (scan fraction stays 1/4 of the index at any scale) and spend the
    * budget on the shortlist: BALANCED c = 5·k — curve point (2 of 8
    * cells, c = 50) at k = 10: recall@10 0.9 sf0.01 / 0.6 sf0.1 — and
    * CHEAP c = 2·k — curve point (2, 20): 0.7 / 0.3 — for callers pricing
    * one narrower broadcast join over recall. Both points are gated one
    * 0.1-step under measured in LlmScaleRehearsal, which also pins these
    * helpers to the gated curve rows. */
  def defaultNprobe(nCells: Int): Int = math.max(1, nCells / 4)
  def defaultRerankWidth(k: Int): Int = 5 * k
  def cheapRerankWidth(k: Int): Int = 2 * k

  /** The cell count is a fixed property of a trained index, but the
    * default-operating-point overloads would otherwise schedule one
    * (tiny) count job PER LOOKUP on the serving path. Memoized by the
    * centroid frame's CANONICALIZED analyzed plan — canonicalization
    * normalizes the fresh ExprIds every `spark.read` mints, so separate
    * reads of the same path actually hit; weak keys so dropped frames
    * don't pin memory. The count job runs OUTSIDE the map's mutex (a
    * losing racer recomputes a constant — cheap — instead of every
    * concurrent lookup blocking behind one cold count). Retraining to a
    * DIFFERENT cell count behind the same path should route through the
    * explicit-nprobe overloads or a fresh session — though even a stale
    * nprobe only moves the recall/cost point, never correctness (the
    * re-rank stays exact) — but a server that retrains in place should
    * call [[invalidateCellCounts]] after publishing the new centroids. */
  private val nCellsCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      java.lang.Integer]())

  /** Drop every memoized cell count. The invalidation hook for the one
    * staleness case the memo admits: retraining to a different cell count
    * behind the SAME centroid path within one session (same canonicalized
    * scan plan → the memo would keep serving the old count, a recall/cost
    * drift, never a correctness one). Call it after publishing retrained
    * centroids; there is no per-frame variant because the canonicalized
    * key is not addressable from outside. */
  def invalidateCellCounts(): Unit = nCellsCache.clear()
  private[graft] def nCellsOf(centroids: DataFrame): Int = {
    val key = centroids.queryExecution.analyzed.canonicalized
    Option(nCellsCache.get(key)).map(_.intValue).getOrElse {
      val n = centroids.count().toInt
      nCellsCache.putIfAbsent(key, n)
      n
    }
  }

  /** [[ivfPqTopKRerank]] at the documented default operating point:
    * quarter-cell probe, c = 5·k shortlist (see [[defaultNprobe]]). */
  def ivfPqTopKRerank(encoded: DataFrame, centroids: DataFrame, codebook: DataFrame,
                      embeddings: DataFrame, queryVecId: Long, k: Int,
                      m: Int, subDim: Int): DataFrame =
    ivfPqTopKRerank(encoded, centroids, codebook, embeddings, queryVecId, k,
      defaultRerankWidth(k), defaultNprobe(nCellsOf(centroids)), m, subDim)

  def ivfPqTopKRerank(encoded: DataFrame, centroids: DataFrame, codebook: DataFrame,
                      embeddings: DataFrame, queryVecId: Long, k: Int, c: Int,
                      nprobe: Int, m: Int, subDim: Int): DataFrame = {
    val query = embeddings.where(col("vec_id") === queryVecId)
    val shortlist = ivfPqTopK(encoded, centroids, codebook, query,
      queryVecId, c, nprobe, m, subDim).select("vec_id")
    val q = broadcast(query.select(col("embedding").as("qe")))
    embeddings.join(broadcast(shortlist), Seq("vec_id"), "left_semi")
      .crossJoin(q)
      .select(col("vec_id"), l2sq(col("embedding"), col("qe")).as("l2_dist"))
      .orderBy(col("l2_dist"), col("vec_id"))
      .limit(k)
  }

  /** Batch two-stage IVF-PQ: every query's ADC shortlist of `c` candidates
    * ([[ivfPqKnnJoin]]) exact-re-ranked in ONE corpus-side pass — the
    * batch counterpart of [[ivfPqTopKRerank]] and the full production
    * retrieval shape. The |queries|·c shortlist is broadcast-sized (the
    * queries are); each streamed payload row fans out only to the queries
    * that shortlisted it, the query vectors join in as a second broadcast
    * dimension, and the per-query top-k window's exchange carries only
    * (query_id, vec_id, l2_dist) triples — the payload never shuffles and
    * no job touches the driver. Final distances and order are exact L2
    * within each query's shortlist; ties break on candidate vec_id. */
  /** [[ivfPqKnnJoinRerank]] at the documented default operating point:
    * quarter-cell probe, c = 5·k shortlist (see [[defaultNprobe]]). */
  def ivfPqKnnJoinRerank(encoded: DataFrame, centroids: DataFrame,
                         codebook: DataFrame, queries: DataFrame,
                         embeddings: DataFrame, k: Int,
                         m: Int, subDim: Int): DataFrame =
    ivfPqKnnJoinRerank(encoded, centroids, codebook, queries, embeddings, k,
      defaultRerankWidth(k), defaultNprobe(nCellsOf(centroids)), m, subDim)

  def ivfPqKnnJoinRerank(encoded: DataFrame, centroids: DataFrame,
                         codebook: DataFrame, queries: DataFrame,
                         embeddings: DataFrame, k: Int, c: Int, nprobe: Int,
                         m: Int, subDim: Int): DataFrame = {
    val shortlist = ivfPqKnnJoin(encoded, centroids, codebook, queries,
      c, nprobe, m, subDim).select(col("query_id"), col("vec_id"))
    val qs = broadcast(queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe")))
    val scored = embeddings.join(broadcast(shortlist), Seq("vec_id"))
      .join(qs, Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        l2sq(col("embedding"), col("qe")).as("l2_dist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("l2_dist"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Batch IVF-PQ ADC k-NN JOIN — the composed index serving MANY queries
    * in one pass (the production retrieval shape: a broadcast-sized probe
    * set against a 100 TB code index). Per query: its `nprobe` nearest
    * cells, a per-(query, cell) ADC table from the re-anchored residual —
    * all of it driver-free broadcast arithmetic, q × nprobe × m × ks rows
    * in ONE broadcast — then candidates in probed cells fan out to the
    * queries probing their cell, score by m table lookups, and reduce
    * through a per-query top-k window whose exchange carries only
    * (query_id, vec_id, adc) triples. The candidate side reads ONLY
    * (vec_id, cell, codes); with the index partitioned by cell the probe
    * prunes to the union of probed cells. Ties break on candidate vec_id;
    * self-matches (vec_id == query_id) are excluded. */
  def ivfPqKnnJoin(encoded: DataFrame, centroids: DataFrame, codebook: DataFrame,
                   queries: DataFrame, k: Int, nprobe: Int,
                   m: Int, subDim: Int): DataFrame = {
    val qs = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    // per-query probed cells: rank centroids by L2 within each query
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d"), col("cell"))
    // NOTE (r14, measured): same reverted-materialization note as
    // ivfPqTopK's probed frame — an eager localCheckpoint here cost jobs
    // (20→23) and wall (1.16→1.50 s) instead of saving the duplicated
    // subtree, whose broadcast stages overlap inside the main DAG.
    val probed = centroids.crossJoin(broadcast(qs))
      .select(col("centroid_id").as("cell"), col("centroid"),
        col("qid"), col("qe"),
        l2sq(col("centroid"), col("qe")).as("d"))
      .withColumn("rnk", row_number().over(wProbe))
      .where(col("rnk") <= nprobe)
      .select(col("qid"), col("cell"),
        zip_with(col("qe"), col("centroid"),
          (x, y) => x.cast("double") - y.cast("double")).as("qr"))
    // one broadcast dense-array row of per-(query, cell) distance tables;
    // the q×nprobe probe frame is broadcast-hinted so the keyless cross
    // resolves to a BroadcastNestedLoopJoin instead of a partition-paired
    // cartesian
    val tblRow = broadcast(denseAdcTable(
      codebook.crossJoin(broadcast(probed))
        .select(col("qid"), col("cell"), col("sub"), col("code_id"),
          l2sq(slice(col("qr"), col("sub") * subDim + 1, lit(subDim)), col("cw")).as("d")),
      keyCols = Seq("qid", "cell")))
    // candidates fan out to the queries probing their cell IN-ROW: the
    // broadcast table row's probe_keys array (q × nprobe (qid, cell)
    // structs with their dense-block ranks) is filtered per candidate and
    // exploded — a candidate in an unprobed cell explodes to nothing,
    // exactly the former inner join's semantics, and the row_number window
    // + broadcast dimension that join needed are gone
    val scored = encoded
      .crossJoin(tblRow)
      .select(col("vec_id") +: (0 until m).map(s => col(s"c$s")) ++: Seq(
        col("tbl"), col("ks"), col("cmin"),
        explode(filter(col("probe_keys"),
          p => p.getField("key").getField("cell") === col("cell"))).as("pk")): _*)
      .where(col("vec_id") =!= col("pk.key.qid"))
      .select(col("pk.key.qid").as("query_id"), col("vec_id"),
        adcSum(col("pk.rank0"), m).as("adc"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adc"), col("vec_id"))
    scored.withColumn("rank", row_number().over(wTop)).where(col("rank") <= k)
  }

  /** Exact k-NN JOIN — batch similarity search: EVERY query row gets its
    * `k` nearest candidates by cosine, in ONE pass over the candidate set.
    * This is the retrieval-pipeline shape (dedup probes, eval-set nearest
    * neighbors, hard-negative mining): queries are broadcast-sized next to
    * a 100 TB corpus, so the whole query set collapses into ONE broadcast
    * row; each streamed candidate computes its norm ONCE, explodes into
    * (query, score) pairs in the same codegen span, and only the
    * (query_id, vec_id, score) triples — never the embedding payload —
    * shuffle into the per-query top-k window. Wall-clock is one corpus
    * scan regardless of |queries|, vs |queries| scans of repeated
    * [[bruteForceTopK]] calls. Ties break on candidate vec_id; a candidate
    * row whose vec_id equals the query's is excluded (self-match). */
  def knnJoin(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val qRow = broadcast(queries
      .agg(array_sort(collect_list(struct(col("vec_id").as("qid"),
        col("embedding").as("qe"), norm(col("embedding")).as("qn")))).as("qs")))
    val scored = candidates.crossJoin(qRow)
      .select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("cn"), explode(col("qs")).as("q"))
      .where(col("q.qid") =!= col("vec_id"))
      .select(col("q.qid").as("query_id"), col("vec_id"),
        (dot(col("embedding"), col("q.qe")) / (col("cn") * col("q.qn"))).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** MMR-diversified retrieval (Carbonell & Goldstein 1998, "The Use of
    * MMR, Diversity-Based Reranking for Reordering Documents and Producing
    * Summaries"): greedily select `k` of the top-`n` relevance shortlist,
    * each pick maximizing `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)` — the
    * standard redundancy-penalized re-rank a RAG stack runs after ANN
    * retrieval, so near-duplicate passages don't crowd the context window.
    * Ties break to the lowest id; the first pick (empty S) is pure
    * relevance.
    *
    * Scale shape: the CORPUS work is the shortlist retrieval; selection
    * itself operates only on the n-row shortlist: the n² pairwise
    * cosines are a broadcast self-join, and the greedy loop — inherently
    * sequential in k — runs as ONE `aggregate` fold over the collected
    * candidate array inside a single row, not as k driver round-trips
    * (the [[ivfPqTopKRerank]] no-collect discipline). Scores are
    * ordered-fold floats + exact halves, so any engine reproduces the
    * selection bit-for-bit. Exhausting the candidates before the k-th
    * pick fails loudly at execution (`raise_error`) rather than
    * returning a silently short result.
    *
    * THIS convenience form derives the shortlist with a
    * [[bruteForceTopK]]-shaped scan that the plan references three times
    * (pairwise left/right + the final rel lookup; a TakeOrdered is not
    * an exchange, so Spark cannot reuse it) — fine when the corpus scan
    * is cheap. A production stack persists its ANN shortlist (IVF/PQ,
    * re-ranked) and calls [[mmrSelectFromShortlist]], where the corpus
    * is never touched at all. */
  def mmrSelect(embeddings: DataFrame, queryVecId: Long, n: Int, k: Int,
                lambda: Double = 0.5): DataFrame = {
    require(k >= 1 && n >= k, s"need 1 <= k <= n, got n=$n k=$k")
    val q = broadcast(embeddings.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"), norm(col("embedding")).as("qn")))
    val shortlist = embeddings.where(col("vec_id") =!= queryVecId)
      .crossJoin(q)
      .select(col("vec_id"), col("embedding"),
        (dot(col("embedding"), col("qe")) / (norm(col("embedding")) * col("qn")))
          .as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(n)
    mmrSelectFromShortlist(shortlist, k, lambda)
  }

  /** The greedy MMR selection as ONE `aggregate` fold over a collected
    * candidate-array column `cands` of (id, rel, sims) structs — k argmax
    * steps inside a single row, no driver round-trips; shared by the
    * single-query and per-query selection stages. Exhausting the
    * candidates before the k-th pick fails loudly. */
  private def mmrSelectionFold(k: Int, lambda: Double): Column = aggregate(
    sequence(lit(1), lit(k)),
    array().cast("array<bigint>"),
    (acc, _) => {
      val best = array_max(transform(
        filter(col("cands"), c => !array_contains(acc, c.getField("id"))),
        c => struct(
          (lit(lambda) * c.getField("rel") - lit(1.0 - lambda) *
            coalesce(array_max(transform(acc,
              s => element_at(c.getField("sims"), s))), lit(0.0))).as("score"),
          (-c.getField("id")).as("nid"))))
      concat(acc, array(
        when(best.isNull, raise_error(lit(
          s"mmrSelect: candidates exhausted before the $k-th pick — " +
            "k exceeds the shortlist actually retrieved")))
          .otherwise(-best.getField("nid")).cast("long")))
    })

  /** [[mmrSelect]]'s selection stage over an ALREADY-RETRIEVED shortlist
    * frame (vec_id, embedding, rel) — the production entry point: the
    * shortlist comes from a persisted ANN index and the corpus is never
    * scanned here. */
  def mmrSelectFromShortlist(shortlist: DataFrame, k: Int,
                             lambda: Double = 0.5): DataFrame = {
    require(k >= 1, s"need k >= 1, got k=$k")
    val pair = shortlist.select(col("vec_id").as("id"),
        col("embedding").as("ea"))
      .join(broadcast(shortlist.select(col("vec_id").as("id_b"),
        col("embedding").as("eb"))), col("id") =!= col("id_b"))
      .select(col("id"), col("id_b"), cosine(col("ea"), col("eb")).as("sim"))
    // one row of candidates, each carrying its pairwise-sim map; the
    // collect order is free to vary — every step below is an argmax over
    // independently-scored elements, so the selection is order-invariant.
    // Candidates come from the SHORTLIST side of a left join (a 1-row
    // shortlist has no pairs at all — its sims map is null, and the
    // score's coalesce treats a null lookup as similarity 0)
    val cands = shortlist.select(col("vec_id").as("id"), col("rel"))
      .join(pair.groupBy(col("id"))
        .agg(map_from_entries(array_sort(
          collect_list(struct(col("id_b"), col("sim"))))).as("sims")),
        Seq("id"), "left_outer")
      .agg(collect_list(struct(col("id"), col("rel"), col("sims"))).as("cands"))
    cands.select(posexplode(mmrSelectionFold(k, lambda)).as(Seq("rank0", "vec_id")))
      .select((col("rank0") + 1).cast("int").as("rank"), col("vec_id"))
      .join(broadcast(shortlist.select(col("vec_id"), col("rel"))), "vec_id")
      .select(col("rank"), col("vec_id"), col("rel"))
      .orderBy(col("rank"))
  }

  /** BATCH MMR — the selection stage for MANY queries' shortlists at once
    * (query_id, vec_id, embedding, rel), composing directly onto
    * [[ivfPqKnnJoinRerank]]'s output: every query's greedy k-pick runs as
    * its own single-row `aggregate` fold, so the whole batch diversifies
    * in ONE job with zero driver round-trips. `rel` is any per-candidate
    * relevance on a scale of the caller's choice (MMR trades it against
    * inter-candidate cosine via λ; Carbonell & Goldstein's sim1/sim2 need
    * not share a scale) — a re-ranked retrieval passes e.g. the negated
    * exact distance.
    *
    * Scale shape: shortlists are broadcast-sized by construction
    * (|queries| × c rows — the corpus work already happened in the
    * retrieval stage), so the pairwise-cosine self-join is a broadcast
    * equi-join on query_id, the per-(query, candidate) sims map is one
    * small aggregate, and the only per-query state is the one collected
    * candidate array its fold runs over. A query whose shortlist is
    * shorter than k fails loudly mid-fold, like the single-query form. */
  def mmrSelectPerQuery(shortlists: DataFrame, k: Int,
                        lambda: Double = 0.5): DataFrame = {
    require(k >= 1, s"need k >= 1, got k=$k")
    // The input is referenced FOUR times below (pairwise left/right, the
    // candidate roll-up, the final rel join). Materialize it here once:
    // shortlists are small by construction (queries × c rows — the same
    // bound the broadcast hints rely on), while their LINEAGE is typically
    // a full ADC+rerank retrieval that an unmaterialized plan would
    // re-execute per reference (~4x the query cost, measured when this
    // lived at a call site). Idempotent if the caller already checkpointed.
    val sl = shortlists.localCheckpoint(true)
    val pair = sl.select(col("query_id"), col("vec_id").as("id"),
        col("embedding").as("ea"))
      .join(broadcast(sl.select(col("query_id"),
        col("vec_id").as("id_b"), col("embedding").as("eb"))), Seq("query_id"))
      .where(col("id") =!= col("id_b"))
      .select(col("query_id"), col("id"), col("id_b"),
        cosine(col("ea"), col("eb")).as("sim"))
    val cands = sl.select(col("query_id"), col("vec_id").as("id"), col("rel"))
      .join(pair.groupBy(col("query_id"), col("id"))
        .agg(map_from_entries(array_sort(
          collect_list(struct(col("id_b"), col("sim"))))).as("sims")),
        Seq("query_id", "id"), "left_outer")
      .groupBy(col("query_id"))
      .agg(collect_list(struct(col("id"), col("rel"), col("sims"))).as("cands"))
    cands.select(col("query_id"),
        posexplode(mmrSelectionFold(k, lambda)).as(Seq("rank0", "vec_id")))
      .select(col("query_id"), (col("rank0") + 1).cast("int").as("rank"), col("vec_id"))
      .join(broadcast(sl.select(col("query_id"), col("vec_id"), col("rel"))),
        Seq("query_id", "vec_id"))
      .select(col("query_id"), col("rank"), col("vec_id"), col("rel"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hard-negative mining for contrastive training: for each query vector,
    * the top-k most-similar candidates whose `label` DIFFERS from the
    * query's — the "close but wrong" examples a contrastive loss needs.
    * Same single-corpus-pass shape as [[knnJoin]]: the query set (with
    * labels) is ONE sorted broadcast row, scoring is a codegen'd fold per
    * (candidate × query), the label filter drops same-class pairs before
    * anything shuffles, and the only exchange carries
    * (query_id, vec_id, label, cos_sim) — never the embedding payload. */
  def hardNegatives(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val qRow = broadcast(queries
      .agg(array_sort(collect_list(struct(col("vec_id").as("qid"),
        col("label").as("ql"), col("embedding").as("qe"),
        norm(col("embedding")).as("qn")))).as("qs")))
    val scored = candidates.crossJoin(qRow)
      .select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("cn"), explode(col("qs")).as("q"))
      .where(col("q.ql") =!= col("label"))
      .select(col("q.qid").as("query_id"), col("vec_id"), col("label"),
        (dot(col("embedding"), col("q.qe")) / (col("cn") * col("q.qn"))).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Contrastive training-tuple assembly: for each query vector, its
    * nearest SAME-label candidate (the positive) and the `kNeg` nearest
    * OTHER-label candidates (the hard negatives) — the (anchor, positive,
    * negatives) rows a contrastive/triplet loss consumes, labeled by
    * `role`. ONE corpus pass scores every candidate against the broadcast
    * query set; the per-(query, role) ranking windows run after the single
    * triples-only exchange — assembling both sides never re-scans the
    * corpus ([[hardNegatives]] and a positive-mining pass would). */
  def contrastiveTuples(queries: DataFrame, candidates: DataFrame,
                        kNeg: Int): DataFrame = {
    val qRow = broadcast(queries
      .agg(array_sort(collect_list(struct(col("vec_id").as("qid"),
        col("label").as("ql"), col("embedding").as("qe"),
        norm(col("embedding")).as("qn")))).as("qs")))
    val scored = candidates.crossJoin(qRow)
      .select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("cn"), explode(col("qs")).as("q"))
      .where(col("q.qid") =!= col("vec_id"))
      .select(col("q.qid").as("query_id"), col("vec_id"), col("label"),
        when(col("label") === col("q.ql"), lit("pos")).otherwise(lit("neg")).as("role"),
        (dot(col("embedding"), col("q.qe")) / (col("cn") * col("q.qn"))).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"), col("role"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where((col("role") === "pos" && col("rank") === 1) ||
        (col("role") === "neg" && col("rank") <= kNeg))
  }

  /** Random-hyperplane LSH signature: one sign bit per hyperplane,
    * concatenated to a string bucket key. Hyperplanes are given as a
    * broadcast-sized DataFrame (plane_id, plane) — deterministic by
    * construction (callers derive planes from fixed rows or seeds).
    *
    * MAP-ONLY (same shape as [[assignCells]]): the plane set becomes ONE
    * broadcast row holding the plane array sorted by plane_id, and the bit
    * string is a per-row fold — no n×planes explode, no groupBy, the
    * embedding payload never shuffles. */
  def hyperplaneBucket(embeddings: DataFrame, planes: DataFrame): DataFrame = {
    val planeRow = broadcast(planes
      .agg(array_sort(collect_list(struct(col("plane_id"), col("plane").as("pl")))).as("ps")))
    embeddings.crossJoin(planeRow)
      .select(col("vec_id"),
        concat_ws("", transform(col("ps"), p =>
          when(dot(col("embedding"), p.getField("pl")) >= 0, lit("1")).otherwise(lit("0"))))
          .as("bucket"))
  }
}
