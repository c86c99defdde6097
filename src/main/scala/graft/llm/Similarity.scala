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

  /** Assign every vector to its nearest centroid (max cosine, centroid id as
    * tie-break). `centroids` must be broadcast-sized (IVF coarse quantizer:
    * hundreds to ~64k cells). Output: input columns + `cell`.
    *
    * MAP-ONLY: the whole centroid set is collapsed into ONE broadcast row
    * holding `array<struct<centroid_id, ce>>`, crossed into the scan, and the
    * argmax is a per-row `array_max` over a `transform` of that array —
    * `max(struct(sim, -id))` picks the highest similarity with lowest-id
    * tie-break. The embedding payload NEVER moves: no hash shuffle anywhere
    * in the plan (the only exchange is the O(k)-row SinglePartition collect
    * that builds the broadcast row on the centroid side). At 100 TB each
    * k-means iteration / IVF build reads the vectors in place. Per-pair
    * `cosine` is the same expression tree as before, so assignments (and
    * their float ties) are bit-identical to the former join+groupBy plan. */
  def assignCells(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val centRow = broadcast(centroids
      .agg(collect_list(struct(col("centroid_id"), col("centroid").as("ce"))).as("cents")))
    embeddings.crossJoin(centRow)
      .withColumn("cell",
        -array_max(transform(col("cents"), c =>
          struct(cosine(col("embedding"), c.getField("ce")).as("s"),
                 (-c.getField("centroid_id")).as("nid"))))
          .getField("nid"))
      .drop("cents")
  }

  /** IVF search: probe only the `nprobe` cells nearest to the query vector,
    * then brute-force within the probed subset. With the index table
    * partitioned by `cell`, the scan touches ~nprobe/|cells| of the data. */
  def ivfTopK(assigned: DataFrame, centroids: DataFrame,
              queryVecId: Long, k: Int, nprobe: Int): DataFrame = {
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
    * DETERMINISM CAVEAT: the `avg` update is a distributed double partial
    * aggregation, so centroid values depend on partition summation order —
    * unlike the repo's hash-gated paths (integer TF-IDF, ordered-fold
    * cosine). Do NOT put trained centroids behind a cross-engine
    * hash-compare gate; assignments derived from FIXED centroids (the
    * oracle-gated queries) stay bit-deterministic. */
  def kmeansCentroids(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    var centroids = embeddings
      .orderBy(col("vec_id")).limit(k)
      .select(row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("vec_id")))
          .cast("long").as("centroid_id"),
        col("embedding").as("centroid"))
      .localCheckpoint(true)
    (0 until iters).foreach { _ =>
      val assigned = assignCells(embeddings, centroids)
      val updated = assigned
        .select(col("cell").as("centroid_id"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("v").cast("double")).as("m"))
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
