package graft.queries

import graft.llm.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import QueryDef.table
import LlmArtifacts._

/** The composed IVF-PQ index family: residual-coded ADC retrieval, two-stage exact re-rank (single and batch), and MMR diversification over the retrieved shortlists.
  * Split out of the former monolithic LlmQueries registry; shared index
  * artifacts live in [[LlmArtifacts]]. See that object for the scale notes
  * common to the family. */
private[queries] object LlmIvfPqQueries {

  val defs: Seq[QueryDef] = Seq(

    // IVF-PQ ANN — the composed 100 TB index (Jégou et al. 2011): coarse
    // L2 quantization to 4 cells, PQ codes over the RESIDUAL (vector −
    // centroid) with 8 codewords per 16-dim subspace, then ADC within the
    // 2 probed cells using a per-cell distance table built from the
    // query's residual. Assignment, residual, and encode are all map-only
    // broadcast shapes; the candidate scan reads only (vec_id, cell,
    // c0..c3). Residual subtraction and the ordered-fold squared-L2 are
    // exact float/double ops, so codes AND ADC scores hash-match DuckDB.
    QueryDef("q_ann_ivfpq",
      (s, d) => Similarity.ivfPqTopK(
        ivfPqOf(s, d), centroidsOf(s, d), ivfPqCodebookOf(s, d),
        spreadEmbeddings(s, d).where(col("vec_id") === 9L),
        queryVecId = 9L, k = 10, nprobe = 2, m = PqM, subDim = PqSubDim),
      Some {
        def l2(a: String, b: String) =
          s"""list_reduce(list_transform(list_zip($a, $b),
             |      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
             |         * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
             |      (p, q) -> p + q)""".stripMargin
        s"""WITH cents AS (
           |  SELECT vec_id AS centroid_id, embedding AS ce
           |  FROM embeddings WHERE vec_id IN (10, 20, 30, 40)),
           |scored AS (
           |  SELECT e.vec_id, e.embedding, c.centroid_id,
           |    ${l2("e.embedding", "c.ce")} AS dist
           |  FROM embeddings e CROSS JOIN cents c),
           |assigned AS (
           |  SELECT vec_id, embedding, centroid_id AS cell FROM scored
           |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) = 1),
           |res AS (
           |  SELECT a.vec_id, a.cell,
           |    list_transform(list_zip(a.embedding, c.ce),
           |      x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS r
           |  FROM assigned a JOIN cents c ON a.cell = c.centroid_id),
           |cw AS (
           |  SELECT s AS sub, CAST(vec_id AS INT) AS code_id, r[s*16+1 : s*16+16] AS cwv
           |  FROM res, unnest([0,1,2,3]) AS su(s)
           |  WHERE vec_id BETWEEN 1 AND 8),
           |dists AS (
           |  SELECT r.vec_id, r.cell, c.sub, c.code_id,
           |    ${l2("r.r[c.sub*16+1 : c.sub*16+16]", "c.cwv")} AS d
           |  FROM res r CROSS JOIN cw c),
           |codes AS (
           |  SELECT vec_id, cell, sub, code_id FROM dists
           |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code_id) = 1),
           |enc AS (
           |  SELECT vec_id, cell,
           |    CAST(max(CASE WHEN sub = 0 THEN code_id END) AS INT) AS c0,
           |    CAST(max(CASE WHEN sub = 1 THEN code_id END) AS INT) AS c1,
           |    CAST(max(CASE WHEN sub = 2 THEN code_id END) AS INT) AS c2,
           |    CAST(max(CASE WHEN sub = 3 THEN code_id END) AS INT) AS c3
           |  FROM codes GROUP BY vec_id, cell),
           |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 9),
           |probed AS (
           |  SELECT c.centroid_id AS cell, c.ce FROM cents c CROSS JOIN q
           |  ORDER BY ${l2("c.ce", "q.qe")}, c.centroid_id LIMIT 2),
           |qres AS (
           |  SELECT p.cell,
           |    list_transform(list_zip(q.qe, p.ce),
           |      x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS qr
           |  FROM probed p CROSS JOIN q),
           |qd AS (
           |  SELECT r.cell, c.sub, c.code_id,
           |    ${l2("r.qr[c.sub*16+1 : c.sub*16+16]", "c.cwv")} AS d
           |  FROM cw c CROSS JOIN qres r)
           |SELECT e.vec_id, e.cell, e.c0, e.c1, e.c2, e.c3,
           |       ((q0.d + q1.d) + q2.d) + q3.d AS adc
           |FROM enc e
           |JOIN qd q0 ON q0.cell = e.cell AND q0.sub = 0 AND q0.code_id = e.c0
           |JOIN qd q1 ON q1.cell = e.cell AND q1.sub = 1 AND q1.code_id = e.c1
           |JOIN qd q2 ON q2.cell = e.cell AND q2.sub = 2 AND q2.code_id = e.c2
           |JOIN qd q3 ON q3.cell = e.cell AND q3.sub = 3 AND q3.code_id = e.c3
           |WHERE e.vec_id <> 9
           |ORDER BY adc, vec_id LIMIT 10""".stripMargin
      }),

    // Two-stage IVF-PQ: ADC shortlist (c=40) from the code index, exact
    // L2 re-rank of ONLY those rows (driver-free broadcast left-semi on
    // the shortlist frame) — removes the cross-cell ADC drift; final
    // top-10 is exact within the shortlist.
    QueryDef("q_ann_ivfpq_rerank",
      (s, d) => Similarity.ivfPqTopKRerank(
        ivfPqOf(s, d), centroidsOf(s, d), ivfPqCodebookOf(s, d),
        spreadEmbeddings(s, d), queryVecId = 9L, k = 10, c = 40,
        nprobe = 2, m = PqM, subDim = PqSubDim),
      Some {
        def l2(a: String, b: String) =
          s"""list_reduce(list_transform(list_zip($a, $b),
             |      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
             |         * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
             |      (p, q) -> p + q)""".stripMargin
        s"""WITH cents AS (
           |  SELECT vec_id AS centroid_id, embedding AS ce
           |  FROM embeddings WHERE vec_id IN (10, 20, 30, 40)),
           |scored AS (
           |  SELECT e.vec_id, e.embedding, c.centroid_id,
           |    ${l2("e.embedding", "c.ce")} AS dist
           |  FROM embeddings e CROSS JOIN cents c),
           |assigned AS (
           |  SELECT vec_id, embedding, centroid_id AS cell FROM scored
           |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) = 1),
           |res AS (
           |  SELECT a.vec_id, a.cell,
           |    list_transform(list_zip(a.embedding, c.ce),
           |      x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS r
           |  FROM assigned a JOIN cents c ON a.cell = c.centroid_id),
           |cw AS (
           |  SELECT s AS sub, CAST(vec_id AS INT) AS code_id, r[s*16+1 : s*16+16] AS cwv
           |  FROM res, unnest([0,1,2,3]) AS su(s)
           |  WHERE vec_id BETWEEN 1 AND 8),
           |dists AS (
           |  SELECT r.vec_id, r.cell, c.sub, c.code_id,
           |    ${l2("r.r[c.sub*16+1 : c.sub*16+16]", "c.cwv")} AS d
           |  FROM res r CROSS JOIN cw c),
           |codes AS (
           |  SELECT vec_id, cell, sub, code_id FROM dists
           |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code_id) = 1),
           |enc AS (
           |  SELECT vec_id, cell,
           |    CAST(max(CASE WHEN sub = 0 THEN code_id END) AS INT) AS c0,
           |    CAST(max(CASE WHEN sub = 1 THEN code_id END) AS INT) AS c1,
           |    CAST(max(CASE WHEN sub = 2 THEN code_id END) AS INT) AS c2,
           |    CAST(max(CASE WHEN sub = 3 THEN code_id END) AS INT) AS c3
           |  FROM codes GROUP BY vec_id, cell),
           |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 9),
           |probed AS (
           |  SELECT c.centroid_id AS cell, c.ce FROM cents c CROSS JOIN q
           |  ORDER BY ${l2("c.ce", "q.qe")}, c.centroid_id LIMIT 2),
           |qres AS (
           |  SELECT p.cell,
           |    list_transform(list_zip(q.qe, p.ce),
           |      x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS qr
           |  FROM probed p CROSS JOIN q),
           |qd AS (
           |  SELECT r.cell, c.sub, c.code_id,
           |    ${l2("r.qr[c.sub*16+1 : c.sub*16+16]", "c.cwv")} AS d
           |  FROM cw c CROSS JOIN qres r),
           |shortlist AS (
           |  SELECT e.vec_id
           |  FROM enc e
           |  JOIN qd q0 ON q0.cell = e.cell AND q0.sub = 0 AND q0.code_id = e.c0
           |  JOIN qd q1 ON q1.cell = e.cell AND q1.sub = 1 AND q1.code_id = e.c1
           |  JOIN qd q2 ON q2.cell = e.cell AND q2.sub = 2 AND q2.code_id = e.c2
           |  JOIN qd q3 ON q3.cell = e.cell AND q3.sub = 3 AND q3.code_id = e.c3
           |  WHERE e.vec_id <> 9
           |  ORDER BY ((q0.d + q1.d) + q2.d) + q3.d, e.vec_id LIMIT 40)
           |SELECT em.vec_id, ${l2("em.embedding", "q.qe")} AS l2_dist
           |FROM embeddings em JOIN shortlist USING (vec_id) CROSS JOIN q
           |ORDER BY l2_dist, vec_id LIMIT 10""".stripMargin
      }),

    // Batch IVF-PQ k-NN join: three query vectors retrieve their top-5
    // from the composed code index in ONE candidate pass — per-query
    // probed cells and per-(query, cell) ADC tables all live in one
    // broadcast; the scan reads only (vec_id, cell, codes).
    QueryDef("q_ann_ivfpq_batch",
      (s, d) => Similarity.ivfPqKnnJoin(
          ivfPqOf(s, d), centroidsOf(s, d), ivfPqCodebookOf(s, d),
          spreadEmbeddings(s, d).where(col("vec_id").isin(9L, 15L, 21L)),
          k = 5, nprobe = 2, m = PqM, subDim = PqSubDim)
        .orderBy(col("query_id"), col("rank")),
      Some {
        def l2(a: String, b: String) =
          s"""list_reduce(list_transform(list_zip($a, $b),
             |      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
             |         * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
             |      (p, q) -> p + q)""".stripMargin
        s"""WITH cents AS (
           |  SELECT vec_id AS centroid_id, embedding AS ce
           |  FROM embeddings WHERE vec_id IN (10, 20, 30, 40)),
           |scored AS (
           |  SELECT e.vec_id, e.embedding, c.centroid_id,
           |    ${l2("e.embedding", "c.ce")} AS dist
           |  FROM embeddings e CROSS JOIN cents c),
           |assigned AS (
           |  SELECT vec_id, embedding, centroid_id AS cell FROM scored
           |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) = 1),
           |res AS (
           |  SELECT a.vec_id, a.cell,
           |    list_transform(list_zip(a.embedding, c.ce),
           |      x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS r
           |  FROM assigned a JOIN cents c ON a.cell = c.centroid_id),
           |cw AS (
           |  SELECT s AS sub, CAST(vec_id AS INT) AS code_id, r[s*16+1 : s*16+16] AS cwv
           |  FROM res, unnest([0,1,2,3]) AS su(s)
           |  WHERE vec_id BETWEEN 1 AND 8),
           |dists AS (
           |  SELECT r.vec_id, r.cell, c.sub, c.code_id,
           |    ${l2("r.r[c.sub*16+1 : c.sub*16+16]", "c.cwv")} AS d
           |  FROM res r CROSS JOIN cw c),
           |codes AS (
           |  SELECT vec_id, cell, sub, code_id FROM dists
           |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code_id) = 1),
           |enc AS (
           |  SELECT vec_id, cell,
           |    CAST(max(CASE WHEN sub = 0 THEN code_id END) AS INT) AS c0,
           |    CAST(max(CASE WHEN sub = 1 THEN code_id END) AS INT) AS c1,
           |    CAST(max(CASE WHEN sub = 2 THEN code_id END) AS INT) AS c2,
           |    CAST(max(CASE WHEN sub = 3 THEN code_id END) AS INT) AS c3
           |  FROM codes GROUP BY vec_id, cell),
           |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           |      WHERE vec_id IN (9, 15, 21)),
           |probed AS (
           |  SELECT q.qid, c.centroid_id AS cell, c.ce, q.qe
           |  FROM cents c CROSS JOIN q
           |  QUALIFY row_number() OVER (PARTITION BY q.qid
           |    ORDER BY ${l2("c.ce", "q.qe")}, c.centroid_id) <= 2),
           |qres AS (
           |  SELECT qid, cell,
           |    list_transform(list_zip(qe, ce),
           |      x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS qr
           |  FROM probed),
           |qd AS (
           |  SELECT r.qid, r.cell, c.sub, c.code_id,
           |    ${l2("r.qr[c.sub*16+1 : c.sub*16+16]", "c.cwv")} AS d
           |  FROM cw c CROSS JOIN qres r)
           |SELECT p.qid AS query_id, e.vec_id,
           |       ((q0.d + q1.d) + q2.d) + q3.d AS adc,
           |       CAST(row_number() OVER (PARTITION BY p.qid
           |         ORDER BY ((q0.d + q1.d) + q2.d) + q3.d, e.vec_id) AS INT) AS "rank"
           |FROM enc e
           |JOIN (SELECT DISTINCT qid, cell FROM probed) p ON p.cell = e.cell
           |JOIN qd q0 ON q0.qid = p.qid AND q0.cell = e.cell AND q0.sub = 0 AND q0.code_id = e.c0
           |JOIN qd q1 ON q1.qid = p.qid AND q1.cell = e.cell AND q1.sub = 1 AND q1.code_id = e.c1
           |JOIN qd q2 ON q2.qid = p.qid AND q2.cell = e.cell AND q2.sub = 2 AND q2.code_id = e.c2
           |JOIN qd q3 ON q3.qid = p.qid AND q3.cell = e.cell AND q3.sub = 3 AND q3.code_id = e.c3
           |WHERE e.vec_id <> p.qid
           |QUALIFY "rank" <= 5
           |ORDER BY query_id, "rank"""".stripMargin
      }),

    // Batch two-stage IVF-PQ: every query's ADC shortlist (c=20) exact
    // L2 re-ranked in ONE corpus-side pass — shortlist broadcast back onto
    // the payload table, per-query top-5 window moving only
    // (query_id, vec_id, l2_dist) triples. Final distances are exact L2,
    // so they hash-match DuckDB bit-for-bit.
    QueryDef("q_ann_ivfpq_batch_rerank",
      (s, d) => Similarity.ivfPqKnnJoinRerank(
          ivfPqOf(s, d), centroidsOf(s, d), ivfPqCodebookOf(s, d),
          spreadEmbeddings(s, d).where(col("vec_id").isin(9L, 15L, 21L)),
          spreadEmbeddings(s, d), k = 5, c = 20, nprobe = 2,
          m = PqM, subDim = PqSubDim)
        .orderBy(col("query_id"), col("rank")),
      Some {
        def l2(a: String, b: String) =
          s"""list_reduce(list_transform(list_zip($a, $b),
             |      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
             |         * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
             |      (p, q) -> p + q)""".stripMargin
        s"""WITH cents AS (
           |  SELECT vec_id AS centroid_id, embedding AS ce
           |  FROM embeddings WHERE vec_id IN (10, 20, 30, 40)),
           |scored AS (
           |  SELECT e.vec_id, e.embedding, c.centroid_id,
           |    ${l2("e.embedding", "c.ce")} AS dist
           |  FROM embeddings e CROSS JOIN cents c),
           |assigned AS (
           |  SELECT vec_id, embedding, centroid_id AS cell FROM scored
           |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) = 1),
           |res AS (
           |  SELECT a.vec_id, a.cell,
           |    list_transform(list_zip(a.embedding, c.ce),
           |      x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS r
           |  FROM assigned a JOIN cents c ON a.cell = c.centroid_id),
           |cw AS (
           |  SELECT s AS sub, CAST(vec_id AS INT) AS code_id, r[s*16+1 : s*16+16] AS cwv
           |  FROM res, unnest([0,1,2,3]) AS su(s)
           |  WHERE vec_id BETWEEN 1 AND 8),
           |dists AS (
           |  SELECT r.vec_id, r.cell, c.sub, c.code_id,
           |    ${l2("r.r[c.sub*16+1 : c.sub*16+16]", "c.cwv")} AS d
           |  FROM res r CROSS JOIN cw c),
           |codes AS (
           |  SELECT vec_id, cell, sub, code_id FROM dists
           |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code_id) = 1),
           |enc AS (
           |  SELECT vec_id, cell,
           |    CAST(max(CASE WHEN sub = 0 THEN code_id END) AS INT) AS c0,
           |    CAST(max(CASE WHEN sub = 1 THEN code_id END) AS INT) AS c1,
           |    CAST(max(CASE WHEN sub = 2 THEN code_id END) AS INT) AS c2,
           |    CAST(max(CASE WHEN sub = 3 THEN code_id END) AS INT) AS c3
           |  FROM codes GROUP BY vec_id, cell),
           |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           |      WHERE vec_id IN (9, 15, 21)),
           |probed AS (
           |  SELECT q.qid, c.centroid_id AS cell, c.ce, q.qe
           |  FROM cents c CROSS JOIN q
           |  QUALIFY row_number() OVER (PARTITION BY q.qid
           |    ORDER BY ${l2("c.ce", "q.qe")}, c.centroid_id) <= 2),
           |qres AS (
           |  SELECT qid, cell,
           |    list_transform(list_zip(qe, ce),
           |      x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS qr
           |  FROM probed),
           |qd AS (
           |  SELECT r.qid, r.cell, c.sub, c.code_id,
           |    ${l2("r.qr[c.sub*16+1 : c.sub*16+16]", "c.cwv")} AS d
           |  FROM cw c CROSS JOIN qres r),
           |shortlist AS (
           |  SELECT p.qid, e.vec_id
           |  FROM enc e
           |  JOIN (SELECT DISTINCT qid, cell FROM probed) p ON p.cell = e.cell
           |  JOIN qd q0 ON q0.qid = p.qid AND q0.cell = e.cell AND q0.sub = 0 AND q0.code_id = e.c0
           |  JOIN qd q1 ON q1.qid = p.qid AND q1.cell = e.cell AND q1.sub = 1 AND q1.code_id = e.c1
           |  JOIN qd q2 ON q2.qid = p.qid AND q2.cell = e.cell AND q2.sub = 2 AND q2.code_id = e.c2
           |  JOIN qd q3 ON q3.qid = p.qid AND q3.cell = e.cell AND q3.sub = 3 AND q3.code_id = e.c3
           |  WHERE e.vec_id <> p.qid
           |  QUALIFY row_number() OVER (PARTITION BY p.qid
           |    ORDER BY ((q0.d + q1.d) + q2.d) + q3.d, e.vec_id) <= 20)
           |SELECT s.qid AS query_id, s.vec_id,
           |       ${l2("em.embedding", "q.qe")} AS l2_dist,
           |       CAST(row_number() OVER (PARTITION BY s.qid
           |         ORDER BY ${l2("em.embedding", "q.qe")}, s.vec_id) AS INT) AS "rank"
           |FROM shortlist s
           |JOIN embeddings em ON em.vec_id = s.vec_id
           |JOIN q ON q.qid = s.qid
           |QUALIFY "rank" <= 5
           |ORDER BY query_id, "rank"""".stripMargin
      }),

    // MMR-diversified retrieval (Carbonell & Goldstein 1998): top-20
    // relevance shortlist for query vector 7, then 5 greedy picks
    // maximizing 0.5·rel − 0.5·max-sim-to-selected. Corpus work = one
    // brute-force scan; the greedy loop folds inside a single row (no
    // driver round-trips). Oracle mirrors the selection with a recursive
    // CTE — identical floats, identical tie-breaks.
    QueryDef("q_mmr_select",
      (s, d) => Similarity.mmrSelect(
        table(s, d, "embeddings").select("vec_id", "embedding"),
        queryVecId = 7L, n = 20, k = 5),
      Some("""WITH RECURSIVE
             |qv AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 7),
             |short AS (
             |  SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS emb,
             |         list_cosine_similarity(e.embedding::DOUBLE[], qv.qe) AS rel
             |  FROM embeddings e, qv WHERE e.vec_id <> 7
             |  ORDER BY rel DESC, e.vec_id LIMIT 20),
             |sims AS (
             |  SELECT a.id AS id_a, b.id AS id_b,
             |         list_cosine_similarity(a.emb, b.emb) AS sim
             |  FROM short a JOIN short b ON a.id <> b.id),
             |sel(step, ids) AS (
             |  SELECT 0, CAST([] AS BIGINT[])
             |  UNION ALL
             |  SELECT step + 1, list_append(ids, (
             |    SELECT c.id FROM short c
             |    WHERE NOT list_contains(s.ids, c.id)
             |    ORDER BY 0.5 * c.rel - 0.5 * coalesce((
             |        SELECT max(p.sim) FROM sims p
             |        WHERE p.id_a = c.id AND list_contains(s.ids, p.id_b)),
             |        0.0) DESC,
             |      c.id
             |    LIMIT 1))
             |  FROM sel s WHERE step < 5)
             |SELECT u.i::INT AS rank, sel.ids[u.i] AS vec_id, short.rel
             |FROM sel, unnest(range(1, 6)) AS u(i)
             |JOIN short ON short.id = sel.ids[u.i]
             |WHERE sel.step = 5
             |ORDER BY rank""".stripMargin)),

    // BATCH MMR over the batch re-rank: three queries retrieve their
    // exact-re-ranked top-8 from the composed code index (one corpus
    // pass), then EVERY query's greedy 4-pick MMR diversification runs as
    // its own single-row aggregate fold in ONE job — no driver
    // round-trips anywhere in the composition. rel = negated exact L2
    // (bit-identical ordered fold on both engines); the oracle mirrors
    // retrieval + per-query greedy selection with a recursive CTE.
    QueryDef("q_mmr_batch",
      (s, d) => {
        val emb = spreadEmbeddings(s, d)
        val rr = Similarity.ivfPqKnnJoinRerank(
          ivfPqOf(s, d), centroidsOf(s, d), ivfPqCodebookOf(s, d),
          emb.where(col("vec_id").isin(9L, 15L, 21L)), emb,
          k = 8, c = 20, nprobe = 2, m = PqM, subDim = PqSubDim)
        // mmrSelectPerQuery materializes the shortlist internally (it
        // references it four times; unmaterialized, each reference would
        // re-run the whole ADC+rerank retrieval — measured ~4x)
        val shortlists = emb
          .join(broadcast(rr.select(col("query_id"), col("vec_id"), col("l2_dist"))),
            Seq("vec_id"))
          .select(col("query_id"), col("vec_id"), col("embedding"),
            (-col("l2_dist")).as("rel"))
        Similarity.mmrSelectPerQuery(shortlists, k = 4)
      },
      Some {
        def l2(a: String, b: String) =
          s"""list_reduce(list_transform(list_zip($a, $b),
             |      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
             |         * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
             |      (p, q) -> p + q)""".stripMargin
        s"""WITH RECURSIVE cents AS (
           |  SELECT vec_id AS centroid_id, embedding AS ce
           |  FROM embeddings WHERE vec_id IN (10, 20, 30, 40)),
           |scored AS (
           |  SELECT e.vec_id, e.embedding, c.centroid_id,
           |    ${l2("e.embedding", "c.ce")} AS dist
           |  FROM embeddings e CROSS JOIN cents c),
           |assigned AS (
           |  SELECT vec_id, embedding, centroid_id AS cell FROM scored
           |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) = 1),
           |res AS (
           |  SELECT a.vec_id, a.cell,
           |    list_transform(list_zip(a.embedding, c.ce),
           |      x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS r
           |  FROM assigned a JOIN cents c ON a.cell = c.centroid_id),
           |cw AS (
           |  SELECT s AS sub, CAST(vec_id AS INT) AS code_id, r[s*16+1 : s*16+16] AS cwv
           |  FROM res, unnest([0,1,2,3]) AS su(s)
           |  WHERE vec_id BETWEEN 1 AND 8),
           |dists AS (
           |  SELECT r.vec_id, r.cell, c.sub, c.code_id,
           |    ${l2("r.r[c.sub*16+1 : c.sub*16+16]", "c.cwv")} AS d
           |  FROM res r CROSS JOIN cw c),
           |codes AS (
           |  SELECT vec_id, cell, sub, code_id FROM dists
           |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code_id) = 1),
           |enc AS (
           |  SELECT vec_id, cell,
           |    CAST(max(CASE WHEN sub = 0 THEN code_id END) AS INT) AS c0,
           |    CAST(max(CASE WHEN sub = 1 THEN code_id END) AS INT) AS c1,
           |    CAST(max(CASE WHEN sub = 2 THEN code_id END) AS INT) AS c2,
           |    CAST(max(CASE WHEN sub = 3 THEN code_id END) AS INT) AS c3
           |  FROM codes GROUP BY vec_id, cell),
           |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           |      WHERE vec_id IN (9, 15, 21)),
           |probed AS (
           |  SELECT q.qid, c.centroid_id AS cell, c.ce, q.qe
           |  FROM cents c CROSS JOIN q
           |  QUALIFY row_number() OVER (PARTITION BY q.qid
           |    ORDER BY ${l2("c.ce", "q.qe")}, c.centroid_id) <= 2),
           |qres AS (
           |  SELECT qid, cell,
           |    list_transform(list_zip(qe, ce),
           |      x -> CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS qr
           |  FROM probed),
           |qd AS (
           |  SELECT r.qid, r.cell, c.sub, c.code_id,
           |    ${l2("r.qr[c.sub*16+1 : c.sub*16+16]", "c.cwv")} AS d
           |  FROM cw c CROSS JOIN qres r),
           |shortlist AS (
           |  SELECT p.qid, e.vec_id
           |  FROM enc e
           |  JOIN (SELECT DISTINCT qid, cell FROM probed) p ON p.cell = e.cell
           |  JOIN qd q0 ON q0.qid = p.qid AND q0.cell = e.cell AND q0.sub = 0 AND q0.code_id = e.c0
           |  JOIN qd q1 ON q1.qid = p.qid AND q1.cell = e.cell AND q1.sub = 1 AND q1.code_id = e.c1
           |  JOIN qd q2 ON q2.qid = p.qid AND q2.cell = e.cell AND q2.sub = 2 AND q2.code_id = e.c2
           |  JOIN qd q3 ON q3.qid = p.qid AND q3.cell = e.cell AND q3.sub = 3 AND q3.code_id = e.c3
           |  WHERE e.vec_id <> p.qid
           |  QUALIFY row_number() OVER (PARTITION BY p.qid
           |    ORDER BY ((q0.d + q1.d) + q2.d) + q3.d, e.vec_id) <= 20),
           |short AS (
           |  SELECT s.qid, s.vec_id, -${l2("em.embedding", "q.qe")} AS rel,
           |         em.embedding::DOUBLE[] AS emb
           |  FROM shortlist s
           |  JOIN embeddings em ON em.vec_id = s.vec_id
           |  JOIN q ON q.qid = s.qid
           |  QUALIFY row_number() OVER (PARTITION BY s.qid
           |    ORDER BY ${l2("em.embedding", "q.qe")}, s.vec_id) <= 8),
           |sims AS (
           |  SELECT a.qid, a.vec_id AS id_a, b.vec_id AS id_b,
           |         list_cosine_similarity(a.emb, b.emb) AS sim
           |  FROM short a JOIN short b ON a.qid = b.qid AND a.vec_id <> b.vec_id),
           |sel(qid, step, ids) AS (
           |  SELECT qid, 0, CAST([] AS BIGINT[]) FROM (SELECT DISTINCT qid FROM short)
           |  UNION ALL
           |  SELECT s.qid, s.step + 1, list_append(s.ids, (
           |    SELECT c.vec_id FROM short c
           |    WHERE c.qid = s.qid AND NOT list_contains(s.ids, c.vec_id)
           |    ORDER BY 0.5 * c.rel - 0.5 * coalesce((
           |        SELECT max(p.sim) FROM sims p
           |        WHERE p.qid = s.qid AND p.id_a = c.vec_id
           |          AND list_contains(s.ids, p.id_b)),
           |        0.0) DESC,
           |      c.vec_id
           |    LIMIT 1))
           |  FROM sel s WHERE s.step < 4)
           |SELECT sel.qid AS query_id, u.i::INT AS "rank", sel.ids[u.i] AS vec_id,
           |       short.rel
           |FROM sel, unnest(range(1, 5)) AS u(i)
           |JOIN short ON short.qid = sel.qid AND short.vec_id = sel.ids[u.i]
           |WHERE sel.step = 4
           |ORDER BY query_id, "rank"""".stripMargin
      })
  )
}
