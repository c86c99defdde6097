package graft.queries

import graft.llm.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import QueryDef.table
import LlmArtifacts._

/** Sampling and mix-design family: stratified/balanced/token-budget sampling, temperature mix, DSIR weights, shard assignment, chunking, packing.
  * Split out of the former monolithic LlmQueries registry; shared index
  * artifacts live in [[LlmArtifacts]]. See that object for the scale notes
  * common to the family. */
private[queries] object LlmSamplingQueries {

  val defs: Seq[QueryDef] = Seq(

    // Training-mix curation: deterministic stratified sampling — each source
    // class keeps a fixed fraction (25/50/75/100% by source number mod 4),
    // membership decided by a salted per-doc hash bucket compared as a hex
    // string (engine-portable, no base conversion). Pure map + one
    // map-side-combined aggregate; a doc's fate never depends on other docs.
    QueryDef("q_mix_sample",
      (s, d) => {
        val thr = {
          // try_cast on the FULL numeric suffix: malformed sources fall to
          // the keep-all branch identically in both engines (ADVICE r5 —
          // a plain cast diverges: Spark ANSI throws, DuckDB errors)
          val cls = expr("try_cast(substr(source, 4) AS INT)") % 4
          when(cls === 0, "40").when(cls === 1, "80")
            .when(cls === 2, "c0").otherwise("zz") // "zz" > any hex: keep all
        }
        graft.llm.Sampling.mixReport(table(s, d, "documents"), "source", thr)
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  count(CASE WHEN substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 2) <
             |    (CASE TRY_CAST(substr(source, 4) AS INT) % 4
             |       WHEN 0 THEN '40' WHEN 1 THEN '80' WHEN 2 THEN 'c0'
             |       ELSE 'zz' END) THEN 1 END) AS n_sampled
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // Sequence packing (concatenate-and-chunk, the GPT pretraining layout):
    // per source stream, docs concatenate in doc_id order and the token
    // stream cuts every 512 tokens; each doc reports its start offset and
    // chunk. Hierarchical prefix sum: sub-streams of 64 ids run their
    // windows in parallel and tiny per-sub totals stitch the exact offsets
    // back — one giant stream never serializes onto one partition. Tokens
    // are NON-EMPTY splits (empty/multi-space text counts zero), mirrored
    // by the oracle's list_filter.
    QueryDef("q_pack_sequences",
      (s, d) => graft.llm.Sampling.packSequences(
          table(s, d, "documents"), capacity = 512, subStreamWidth = 64L)
        .orderBy(col("source"), col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
             |              AS BIGINT) AS n_tokens
             |  FROM documents),
             |o AS (
             |  SELECT doc_id, source, n_tokens,
             |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |                             ROWS UNBOUNDED PRECEDING) - n_tokens
             |         AS BIGINT) AS start_offset
             |  FROM t)
             |SELECT doc_id, source, n_tokens, start_offset,
             |       start_offset // 512 AS bin
             |FROM o ORDER BY source, doc_id""".stripMargin)),

    // DSIR importance weights: target = English docs, features = word
    // unigrams hashed into 256 md5 buckets, both models on the same bucket
    // space, add-1 smoothed; each token contributes an integer bit-length
    // quantization of log2[p_tgt/p_raw] — order-free, engine-exact. The
    // explode feeds model AND scoring through one shared (doc, bucket)
    // aggregate; models broadcast back.
    QueryDef("q_dsir_weights",
      (s, d) => graft.llm.Sampling.importanceWeights(
          spreadDocs(s, d), isTarget = col("lang") === "en")
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
             |  SELECT doc_id, is_target, ('0x' || substr(md5(token), 1, 2))::INT AS b
             |  FROM (SELECT doc_id, lang = 'en' AS is_target,
             |               unnest(string_split(text, ' ')) AS token
             |        FROM documents)
             |  WHERE token <> ''),
             |dbc AS (
             |  SELECT doc_id, is_target, b, count(*)::BIGINT AS c
             |  FROM toks GROUP BY 1, 2, 3),
             |model AS (
             |  SELECT b, sum(c)::BIGINT AS c_raw,
             |         sum(CASE WHEN is_target THEN c ELSE 0 END)::BIGINT AS c_tgt
             |  FROM dbc GROUP BY b),
             |totals AS (SELECT sum(c_raw)::BIGINT AS n_raw, sum(c_tgt)::BIGINT AS n_tgt FROM model)
             |SELECT doc_id, sum(c)::BIGINT AS n_tokens,
             |       sum(c * (length(bin(c_tgt + 1)) - length(bin(c_raw + 1))
             |              + length(bin(n_raw + 1)) - length(bin(n_tgt + 1))))::BIGINT AS dsir_bits
             |FROM dbc JOIN model USING (b) CROSS JOIN totals
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Temperature-scaled mixture weights (α=0.5): per-source token mass,
    // raw share, and sqrt-share — sqrt is the IEEE-correctly-rounded power,
    // and the denominator is an ordered fold over source-sorted weights, so
    // both floats hash-match exactly. One corpus aggregation + one
    // single-row broadcast.
    QueryDef("q_temperature_mix",
      (s, d) => graft.llm.Sampling.temperatureMixWeights(table(s, d, "documents"))
        .orderBy(col("source")),
      Some("""WITH per AS (
             |  SELECT source,
             |    CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
             |      AS n_tokens
             |  FROM documents GROUP BY source),
             |tot AS (
             |  SELECT CAST(sum(n_tokens) AS BIGINT) AS n_total,
             |         list_reduce(list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY source),
             |                     (a, b) -> a + b) AS w_total
             |  FROM per)
             |SELECT source, n_tokens,
             |       CAST(n_tokens AS DOUBLE) / CAST(n_total AS DOUBLE) AS p_raw,
             |       sqrt(CAST(n_tokens AS DOUBLE)) / w_total AS p_temp
             |FROM per CROSS JOIN tot ORDER BY source""".stripMargin)),

    // Deterministic global shuffle: 16 hash shards (first md5 nibble, kept
    // as the hex char — no base conversion in any engine) + rank within the
    // shard by the full salted hash. Assignment is a map; the position is
    // the one shard-keyed exchange that also writes the output.
    QueryDef("q_shard_assign",
      (s, d) => graft.llm.Sampling.shardAssignment(table(s, d, "documents"))
        .orderBy(col("shard"), col("pos")),
      Some("""SELECT doc_id,
             |  substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             |  row_number() OVER (
             |    PARTITION BY substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 1)
             |    ORDER BY md5('shard' || CAST(doc_id AS VARCHAR)), doc_id)::BIGINT AS pos
             |FROM documents ORDER BY shard, pos""".stripMargin)),

    // Deterministic EPOCH SHUFFLE: globally dense training positions
    // 0..n-1 = rank of the salted hash, computed WITHOUT an unpartitioned
    // window — 16 hash-prefix range shards, tiny prefix-sum offsets
    // broadcast back, rank within shard. The oracle states the spec
    // directly as the naive global row_number; values must agree exactly.
    QueryDef("q_epoch_shuffle",
      (s, d) => graft.llm.Sampling.epochOrder(table(s, d, "documents"), epoch = 3)
        .orderBy(col("position")),
      Some("""SELECT doc_id,
             |  (row_number() OVER (
             |     ORDER BY md5('epoch3:' || CAST(doc_id AS VARCHAR)), doc_id)
             |   - 1)::BIGINT AS position
             |FROM documents ORDER BY position""".stripMargin)),

    // Resumable slice of the epoch order: positions [100, 150) without
    // ranking the whole corpus — shard offsets prune non-intersecting
    // shards before the rank window. The oracle is the naive global
    // rank filtered; values must agree exactly.
    QueryDef("q_epoch_slice",
      (s, d) => graft.llm.Sampling.epochSlice(
          table(s, d, "documents"), from = 100L, until = 150L, epoch = 3)
        .orderBy(col("position")),
      Some("""WITH ord AS (
             |  SELECT doc_id,
             |    (row_number() OVER (
             |       ORDER BY md5('epoch3:' || CAST(doc_id AS VARCHAR)), doc_id)
             |     - 1)::BIGINT AS position
             |  FROM documents)
             |SELECT doc_id, position FROM ord
             |WHERE position >= 100 AND position < 150
             |ORDER BY position""".stripMargin)),

    // Mix design in tokens: fill each source's 500-token budget in
    // quality-score order (boundary doc kept — the budget is a coverage
    // floor). One stratum-keyed exchange; exact integer running sums.
    QueryDef("q_token_budget_sample",
      // qualityScore ∈ [0, 1] is a KNOWN range, so the arithmetic-cuts
      // path applies: the sampled-bounds pass (an extra corpus scan)
      // vanishes, and the range is advisory — it steers bucket sizes only,
      // never the kept set (LlmSpec proves a wrong range changes nothing)
      (s, d) => graft.llm.Sampling.budgetCappedSample(
          table(s, d, "documents"), tokenBudget = 500L,
          rankCol = graft.llm.TextAnalysis.qualityScore(col("text")),
          rankRange = Some((0.0, 1.0)))
        .orderBy(col("source"), col("cum_tokens"), col("doc_id")),
      Some("""WITH s AS (
             |  SELECT source, doc_id,
             |    (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
             |       / greatest(CAST(len(string_split(text,' ')) AS DOUBLE), 1.0)
             |     + CASE WHEN len(list_filter(string_split(text,' '),
             |                    x -> x IN ('the','and','of'))) > 0 THEN 1.0 ELSE 0.0 END
             |     + CASE WHEN length(text) BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.0 END
             |    ) / 3.0 AS q,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (SELECT source, doc_id, n_tokens,
             |        (sum(n_tokens) OVER (PARTITION BY source ORDER BY q DESC, doc_id
             |                             ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens
             |      FROM s)
             |SELECT source, doc_id, n_tokens, cum_tokens
             |FROM c WHERE cum_tokens - n_tokens < 500
             |ORDER BY source, cum_tokens, doc_id""".stripMargin)),

    // RAG-chunker layout: 64-token windows every 48 tokens (overlapping
    // context), minimal grid cover — pure map, zero shuffle; integers only
    // except the chunk text itself.
    QueryDef("q_chunk_overlap",
      (s, d) => graft.llm.Sampling.chunkWithOverlap(
          table(s, d, "documents"), window = 64, stride = 48)
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH t AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents)
             |SELECT doc_id, k::BIGINT AS chunk_idx, (k * 48)::BIGINT AS start_tok,
             |       least(64, len(toks) - k * 48)::BIGINT AS n_chunk_tokens,
             |       array_to_string(toks[k * 48 + 1 : k * 48 + 64], ' ') AS chunk_text
             |FROM t, unnest(range(0, 1 + (greatest(len(toks) - 64, 0) + 47) // 48)) AS u(k)
             |WHERE len(toks) >= 1
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Topic-diversity cap over the persisted IVF cell assignment: at most
    // 50 vectors per cell, picked by salted hash (uniform within the cell,
    // not biased toward low ids); each kept row carries the cell's total so
    // the realized mix is read off the output. One cell-keyed exchange.
    QueryDef("q_cluster_balance",
      (s, d) => graft.llm.Sampling.balancedSample(
          ivfOf(s, d).select(col("vec_id"), col("cell")),
          groupCol = "cell", cap = 50, idCol = "vec_id")
        .orderBy(col("cell"), col("pick")),
      Some("""WITH cents AS (
             |  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce
             |  FROM embeddings WHERE vec_id IN (10, 20, 30, 40)),
             |scored AS (
             |  SELECT e.vec_id, c.centroid_id,
             |         list_cosine_similarity(e.embedding::DOUBLE[], c.ce) AS sim
             |  FROM embeddings e CROSS JOIN cents c),
             |assigned AS (
             |  SELECT vec_id, centroid_id AS cell FROM scored
             |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) = 1)
             |SELECT vec_id, cell, pick, n_group FROM (
             |  SELECT vec_id, cell,
             |         row_number() OVER (PARTITION BY cell
             |           ORDER BY md5('bal' || CAST(vec_id AS VARCHAR)), vec_id)::BIGINT AS pick,
             |         count(*) OVER (PARTITION BY cell)::BIGINT AS n_group
             |  FROM assigned)
             |WHERE pick <= 50 ORDER BY cell, pick""".stripMargin))
  )
}
