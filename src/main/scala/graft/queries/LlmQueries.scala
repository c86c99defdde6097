package graft.queries

import org.apache.spark.sql.functions._
import QueryDef.table

/** Training-data pipeline operators over `documents` and `embeddings` —
  * dedup (exact / MinHash-LSH / SimHash / token-Jaccard), similarity search
  * (brute-force cosine), text analysis (language-ID, quality signals, token
  * counts, fingerprinting). Hash functions are md5-derived so the DuckDB
  * oracle can reproduce them exactly; cosine is computed as an ordered
  * sequential double fold, which is bit-identical between Spark's
  * `aggregate` HOF and DuckDB's list_cosine_similarity (verified empirically).
  *
  * Scale notes: every shape here is a groupBy/join on a derived key — at
  * 100 TB the shingle explode is the big intermediate, bounded by
  * banding (LSH) so candidate pairs stay ~linear in near-dup count. */
object LlmQueries {

  /** MinHash signatures (k=4) over char-8-gram shingles — ONE md5 per shingle
    * position, four hash functions carved out of its disjoint 8-hex-char
    * substrings, four mins folded in a single groupBy pass (no seed explode:
    * 4× less hashing and 4× fewer shuffle rows than the naive
    * per-seed-explode shape — that's the version that scales).
    * Spark and DuckDB sides mirror the derivation exactly. */
  private val sigsWideSparkSql =
    """SELECT doc_id,
      |       min(substr(h, 1, 8)) AS mh0, min(substr(h, 9, 8)) AS mh1,
      |       min(substr(h, 17, 8)) AS mh2, min(substr(h, 25, 8)) AS mh3
      |FROM (SELECT doc_id, md5(substr(text, i, 8)) AS h
      |      FROM (SELECT doc_id, text, explode(sequence(1, greatest(length(text) - 7, 1))) AS i
      |            FROM documents))
      |GROUP BY doc_id""".stripMargin

  private val sigsWideDuckSql =
    """sigs AS (
      |  SELECT doc_id,
      |         min(substr(h, 1, 8)) AS mh0, min(substr(h, 9, 8)) AS mh1,
      |         min(substr(h, 17, 8)) AS mh2, min(substr(h, 25, 8)) AS mh3
      |  FROM (SELECT doc_id, md5(substr(text, i, 8)) AS h
      |        FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 6, 2))) AS i
      |              FROM documents))
      |  GROUP BY doc_id)""".stripMargin

  /** 2 bands × 2 rows: docs agreeing on a whole band are candidate dups. */
  private val bandsSparkSql =
    """bands AS (
      |  SELECT doc_id, 0 AS band, concat(mh0, mh1) AS sig FROM sigs
      |  UNION ALL
      |  SELECT doc_id, 1 AS band, concat(mh2, mh3) AS sig FROM sigs),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  private val bandsDuckSql =
    """bands AS (
      |  SELECT doc_id, 0 AS band, mh0 || mh1 AS sig FROM sigs
      |  UNION ALL
      |  SELECT doc_id, 1 AS band, mh2 || mh3 AS sig FROM sigs),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: content-hash groupBy; survivor = min doc_id (one shuffle
    // on the hash — the 100 TB shape; no pairwise comparison anywhere).
    QueryDef("q_dedup_exact",
      (s, d) => table(s, d, "documents")
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("content_hash")),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin)),

    // Text quality signals: counts only (exact integers — no float ratios in
    // the compare surface; downstream can derive any ratio).
    QueryDef("q_text_stats",
      (s, d) => {
        table(s, d, "documents").createOrReplaceTempView("documents")
        s.sql("""SELECT doc_id, n_chars,
                |  CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
                |  CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
                |  CAST(size(filter(split(text, ' '), x -> x = 'the')) AS BIGINT) AS n_the,
                |  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
                |FROM documents ORDER BY doc_id""".stripMargin)
      },
      Some("""SELECT doc_id, n_chars,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
             |  CAST(len(list_filter(string_split(text, ' '), x -> x = 'the')) AS BIGINT) AS n_the,
             |  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Language-ID: marker-stopword n-gram heuristic with a fixed tie-break
    // chain (en > de > fr > es). Deterministic by construction.
    QueryDef("q_lang_id",
      (s, d) => {
        table(s, d, "documents").createOrReplaceTempView("documents")
        s.sql("""SELECT doc_id, lang,
                |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                |       WHEN s_fr >= s_es THEN 'fr'
                |       ELSE 'es' END AS lang_pred
                |FROM (SELECT doc_id, lang,
                |        CAST(size(filter(split(text,' '), x -> x IN ('the','and','of'))) AS BIGINT) AS s_en,
                |        CAST(size(filter(split(text,' '), x -> x IN ('der','und','das'))) AS BIGINT) AS s_de,
                |        CAST(size(filter(split(text,' '), x -> x IN ('le','et','les'))) AS BIGINT) AS s_fr,
                |        CAST(size(filter(split(text,' '), x -> x IN ('el','y','los'))) AS BIGINT) AS s_es
                |      FROM documents)
                |ORDER BY doc_id""".stripMargin)
      },
      Some("""SELECT doc_id, lang,
             |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
             |       WHEN s_fr >= s_es THEN 'fr'
             |       ELSE 'es' END AS lang_pred
             |FROM (SELECT doc_id, lang,
             |        len(list_filter(string_split(text,' '), x -> x IN ('the','and','of'))) AS s_en,
             |        len(list_filter(string_split(text,' '), x -> x IN ('der','und','das'))) AS s_de,
             |        len(list_filter(string_split(text,' '), x -> x IN ('le','et','les'))) AS s_fr,
             |        len(list_filter(string_split(text,' '), x -> x IN ('el','y','los'))) AS s_es
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // Document fingerprint: hash of the sorted distinct token set (order- and
    // repetition-invariant content signature).
    QueryDef("q_fingerprint",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"),
          md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " "))
            .as("fingerprint"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // MinHash signatures (k=4) over char-8-gram shingles, long form output.
    QueryDef("q_minhash_sigs",
      (s, d) => {
        table(s, d, "documents").createOrReplaceTempView("documents")
        s.sql(s"""WITH sigs AS ($sigsWideSparkSql)
                 |SELECT doc_id, seed, mh FROM (
                 |  SELECT doc_id, stack(4, 0, mh0, 1, mh1, 2, mh2, 3, mh3) AS (seed, mh)
                 |  FROM sigs)
                 |ORDER BY doc_id, seed""".stripMargin)
      },
      Some(s"""WITH $sigsWideDuckSql
              |SELECT doc_id, s.seed,
              |       CASE s.seed WHEN 0 THEN mh0 WHEN 1 THEN mh1
              |                   WHEN 2 THEN mh2 ELSE mh3 END AS mh
              |FROM sigs, (VALUES (0),(1),(2),(3)) AS s(seed)
              |ORDER BY doc_id, seed""".stripMargin)),

    // MinHash-LSH near-dup candidates: 2 bands × 2 minhashes; pairs agreeing
    // on a full band. The join is on the band signature — candidates stay
    // ~linear in true near-dups, never O(n²).
    QueryDef("q_lsh_dup_pairs",
      (s, d) => {
        table(s, d, "documents").createOrReplaceTempView("documents")
        s.sql(s"""WITH sigs AS ($sigsWideSparkSql),
                 |$bandsSparkSql
                 |SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin)
      },
      Some(s"""WITH $sigsWideDuckSql,
              |$bandsDuckSql
              |SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin)),

    // Token-Jaccard on the LSH candidates: |A∩B| plus set sizes (exact ints;
    // the ratio is downstream arithmetic).
    QueryDef("q_jaccard_lsh",
      (s, d) => {
        table(s, d, "documents").createOrReplaceTempView("documents")
        s.sql(s"""WITH sigs AS ($sigsWideSparkSql),
                 |$bandsSparkSql,
                 |tok AS (SELECT DISTINCT doc_id, token FROM
                 |        (SELECT doc_id, explode(split(text, ' ')) AS token FROM documents)),
                 |sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
                 |inter AS (
                 |  SELECT p.doc_a, p.doc_b, count(*) AS n_common
                 |  FROM pairs p
                 |  JOIN tok ta ON ta.doc_id = p.doc_a
                 |  JOIN tok tb ON tb.doc_id = p.doc_b AND tb.token = ta.token
                 |  GROUP BY p.doc_a, p.doc_b)
                 |SELECT p.doc_a, p.doc_b, COALESCE(i.n_common, 0) AS n_common,
                 |       sa.sz AS size_a, sb.sz AS size_b
                 |FROM pairs p
                 |JOIN sizes sa ON sa.doc_id = p.doc_a
                 |JOIN sizes sb ON sb.doc_id = p.doc_b
                 |LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
                 |ORDER BY p.doc_a, p.doc_b""".stripMargin)
      },
      Some(s"""WITH $sigsWideDuckSql,
              |$bandsDuckSql,
              |tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
              |sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
              |inter AS (
              |  SELECT p.doc_a, p.doc_b, count(*) AS n_common
              |  FROM pairs p
              |  JOIN tok ta ON ta.doc_id = p.doc_a
              |  JOIN tok tb ON tb.doc_id = p.doc_b AND tb.token = ta.token
              |  GROUP BY p.doc_a, p.doc_b)
              |SELECT p.doc_a, p.doc_b, COALESCE(i.n_common, 0) AS n_common,
              |       sa.sz AS size_a, sb.sz AS size_b
              |FROM pairs p
              |JOIN sizes sa ON sa.doc_id = p.doc_a
              |JOIN sizes sb ON sb.doc_id = p.doc_b
              |LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
              |ORDER BY p.doc_a, p.doc_b""".stripMargin)),

    // SimHash (16-bit, md5-nibble hash family): per-bit majority vote over
    // token hashes → compact near-dup fingerprint.
    QueryDef("q_simhash",
      (s, d) => {
        table(s, d, "documents").createOrReplaceTempView("documents")
        s.sql("""SELECT doc_id,
                |  CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b - 1) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
                |FROM (
                |  SELECT doc_id, b,
                |         sum(CASE WHEN substr(md5(token), b, 1) >= '8' THEN 1 ELSE -1 END) AS s
                |  FROM (SELECT doc_id, explode(split(text, ' ')) AS token FROM documents)
                |  LATERAL VIEW explode(sequence(1, 16)) t AS b
                |  GROUP BY doc_id, b)
                |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
      },
      Some("""SELECT doc_id,
             |  CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b - 1) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
             |FROM (
             |  SELECT doc_id, b,
             |         sum(CASE WHEN substr(md5(token), b, 1) >= '8' THEN 1 ELSE -1 END) AS s
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
             |       unnest(range(1, 17)) AS bs(b)
             |  GROUP BY doc_id, b)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Brute-force cosine top-k (the ANN baseline): ordered sequential double
    // fold — bit-identical to DuckDB's list_cosine_similarity on DOUBLE[].
    // At 100 TB the same plan holds with the query side broadcast; the IVF
    // variant (graft.llm.Similarity) prunes candidates by centroid first.
    QueryDef("q_knn_cosine",
      (s, d) => {
        table(s, d, "embeddings").createOrReplaceTempView("embeddings")
        s.sql("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
                |SELECT vec_id,
                |  aggregate(zip_with(embedding, qe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                |            CAST(0 AS DOUBLE), (acc, v) -> acc + v)
                |  / (sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                |                    CAST(0 AS DOUBLE), (acc, v) -> acc + v))
                |     * sqrt(aggregate(transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                |                      CAST(0 AS DOUBLE), (acc, v) -> acc + v))) AS cos_sim
                |FROM embeddings, q WHERE vec_id <> 0
                |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
             |SELECT vec_id, list_cosine_similarity(embedding::DOUBLE[], qe) AS cos_sim
             |FROM embeddings, q WHERE vec_id <> 0
             |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)),

    // Multimodal plumbing (metadata side): opaque-bytes length + a
    // deterministic md5-derived feature — the decode itself is stubbed in
    // graft.llm.Multimodal (no media libs in this container).
    QueryDef("q_multimodal_meta",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          substring(md5(col("text")), 1, 8).as("content_key"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
             |       substr(md5(text), 1, 8) AS content_key
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
