package graft.queries

import graft.llm.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import QueryDef.table
import LlmArtifacts._

/** Text-analysis family: language-ID, quality signals and classifier, TF-IDF/BM25, winnowing, BPE, PMI phrases, surprisal, PII, blocklist.
  * Split out of the former monolithic LlmQueries registry; shared index
  * artifacts live in [[LlmArtifacts]]. See that object for the scale notes
  * common to the family. */
private[queries] object LlmTextQueries {

  /** 240 fixed merges for the encode query — every ordered DISTINCT pair
    * of the 16 most common English letters, in iteration order: deep
    * enough to exercise the chained-projection encode at a
    * production-shaped depth (the former nested-fold form could not
    * analyze a list this long), fully mirrorable as a DuckDB CTE chain.
    * Early merges fire densely on real text; later ones often no-op on
    * already-fused symbols — both engines must agree either way. */
  private val BpeEncodeMerges: Seq[(String, String)] = {
    val letters = "etaoinshrdlucmfw"
    for { l <- letters.toSeq; r <- letters.toSeq if l != r }
      yield (l.toString, r.toString)
  }

  /** The oracle as a GENERATED chain of one CTE per merge — the same
    * linear chained-pass shape the Spark plan has (measured: DuckDB binds
    * and runs the 240-CTE chain in ~0.1 s). */
  private def bpeEncodeDuckSql: String = {
    val passes = BpeEncodeMerges.zipWithIndex.map { case ((l, r), k) =>
      s"""m${k + 1} AS (
         |  SELECT doc_id, word_idx, list_filter(list_transform(syms, (t, i) ->
         |    CASE WHEN t = '$l' AND syms[i + 1] = '$r' THEN '$l$r'
         |         WHEN t = '$r' AND syms[i - 1] = '$l' THEN NULL
         |         ELSE t END), x -> x IS NOT NULL) AS syms
         |  FROM m$k)""".stripMargin
    }
    s"""WITH m0 AS (
       |  SELECT doc_id, i - 1 AS word_idx, string_split(words[i], '') AS syms
       |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
       |        FROM documents),
       |       unnest(range(1, len(words) + 1)) AS u(i)),
       |${passes.mkString(",\n")}
       |SELECT doc_id, word_idx::BIGINT AS word_idx,
       |       array_to_string(syms, '|') AS encoded,
       |       len(syms)::BIGINT AS n_symbols
       |FROM m${BpeEncodeMerges.size} ORDER BY doc_id, word_idx""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // Per-source DATA CARD: docs / tokens / quality passes / globally
    // duplicated docs / distinct contents — all integers (per-doc double
    // compares only), folded content-first so the dup window runs over
    // distinct contents, never docs.
    QueryDef("q_data_card",
      (s, d) => graft.llm.TextAnalysis.dataCard(table(s, d, "documents"))
        .orderBy(col("source")),
      Some("""WITH per AS (
             |  SELECT source, md5(text) AS h,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
             |      AS n_tok,
             |    CASE WHEN ((CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
             |           / greatest(CAST(len(string_split(text,' ')) AS DOUBLE), 1.0)
             |         + CASE WHEN len(list_filter(string_split(text,' '),
             |                        x -> x IN ('the','and','of'))) > 0 THEN 1.0 ELSE 0.0 END
             |         + CASE WHEN length(text) BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.0 END
             |        ) / 3.0) >= 0.5 THEN 1 ELSE 0 END AS q_ok
             |  FROM documents),
             |tot AS (SELECT h, count(*) AS tot FROM per GROUP BY h)
             |SELECT source,
             |  count(*)::BIGINT AS n_docs,
             |  sum(n_tok)::BIGINT AS n_tokens,
             |  sum(q_ok)::BIGINT AS n_quality_docs,
             |  sum(CASE WHEN tot > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
             |  count(DISTINCT h)::BIGINT AS n_distinct_contents
             |FROM per JOIN tot USING (h)
             |GROUP BY source ORDER BY source""".stripMargin)),

    // Corpus drift — the statistical companion to q_corpus_diff (same
    // snapshot-B derivation): the 50 terms whose unigram probability moved
    // most between versions, ranked by the cross-multiplied integer shift
    // |cnt_a*N_b - cnt_b*N_a| so the compare surface stays float-free.
    QueryDef("q_corpus_drift",
      (s, d) => {
        val a = table(s, d, "documents")
        val b = a.where(col("doc_id") % 11 =!= 0)
          .select(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
          .unionByName(a.where(col("doc_id") % 13 === 0).select(col("text")))
        TextAnalysis.corpusDrift(a.select(col("text")), b, k = 50)
      },
      Some("""WITH bdocs AS (
             |  SELECT CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
             |  FROM documents WHERE doc_id % 11 <> 0
             |  UNION ALL
             |  SELECT text FROM documents WHERE doc_id % 13 = 0),
             |ta AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
             |       FROM documents),
             |tb AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
             |       FROM bdocs),
             |ca AS (SELECT term, count(*)::BIGINT AS cnt_a FROM ta GROUP BY 1),
             |cb AS (SELECT term, count(*)::BIGINT AS cnt_b FROM tb GROUP BY 1),
             |j AS (SELECT term, COALESCE(cnt_a, 0)::BIGINT AS cnt_a,
             |             COALESCE(cnt_b, 0)::BIGINT AS cnt_b
             |      FROM ca FULL OUTER JOIN cb USING (term))
             |SELECT term, cnt_a, cnt_b,
             |       abs(cnt_a::HUGEINT * (SELECT sum(cnt_b) FROM cb)::HUGEINT
             |         - cnt_b::HUGEINT * (SELECT sum(cnt_a) FROM ca)::HUGEINT)
             |         ::BIGINT AS shift
             |FROM j ORDER BY shift DESC, term ASC LIMIT 50""".stripMargin)),

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

    // PII scan + redaction over the corpus. The word-soup fixture carries no
    // natural PII, so the query plants deterministic markers derived from
    // doc_id (email every 3rd doc, phone every 5th, IPv4 every 7th) before
    // the scan — the operator sees a text column like any other; counts and
    // the redacted text are exact strings, so the compare is strict. Pure
    // map (codegen'd regexes), no shuffle.
    QueryDef("q_pii_scan",
      (s, d) => {
        val injected = table(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" contact user"), col("doc_id").cast("string"),
                lit("@example.com now"))).otherwise(lit("")),
            when(col("doc_id") % 5 === 0, lit(" call 555-123-4567")).otherwise(lit("")),
            when(col("doc_id") % 7 === 0, lit(" from 10.0.0.1 today")).otherwise(lit("")))
            .as("text"))
        graft.llm.TextAnalysis.piiScan(injected).orderBy(col("doc_id"))
      },
      Some("""WITH injected AS (
             |  SELECT doc_id, text ||
             |    CASE WHEN doc_id % 3 = 0
             |         THEN ' contact user' || doc_id || '@example.com now' ELSE '' END ||
             |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567' ELSE '' END ||
             |    CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.0.1 today' ELSE '' END AS text
             |  FROM documents)
             |, staged AS (
             |  SELECT doc_id, text,
             |    regexp_replace(text,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS no_email
             |  FROM injected),
             |staged2 AS (
             |  SELECT doc_id, text, no_email,
             |    regexp_replace(no_email, '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS no_phone
             |  FROM staged)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS email_count,
             |  CAST(len(regexp_extract_all(no_email, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS phone_count,
             |  CAST(len(regexp_extract_all(no_phone, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS ip_count,
             |  regexp_replace(no_phone,
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS redacted
             |FROM staged2 ORDER BY doc_id""".stripMargin)),

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

    // Classifier EVALUATION: the language-ID confusion matrix against the
    // corpus's ground-truth lang column — per (true, predicted) counts,
    // the quality report a pipeline publishes before trusting a filter.
    // (zh has no marker set, so it lands wherever the argmax ties fall —
    // visible in the matrix, which is the point of publishing it.)
    QueryDef("q_lang_confusion",
      (s, d) => {
        val docs = table(s, d, "documents")
        docs.select(col("lang"), TextAnalysis.langId(docs).as("lang_pred"))
          .groupBy(col("lang"), col("lang_pred"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("lang_pred"))
      },
      Some("""SELECT lang,
             |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
             |       WHEN s_fr >= s_es THEN 'fr'
             |       ELSE 'es' END AS lang_pred,
             |  count(*) AS n
             |FROM (SELECT lang,
             |        len(list_filter(string_split(text,' '), x -> x IN ('the','and','of'))) AS s_en,
             |        len(list_filter(string_split(text,' '), x -> x IN ('der','und','das'))) AS s_de,
             |        len(list_filter(string_split(text,' '), x -> x IN ('le','et','les'))) AS s_fr,
             |        len(list_filter(string_split(text,' '), x -> x IN ('el','y','los'))) AS s_es
             |      FROM documents)
             |GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin)),

    // Semi-structured extraction: typed fields pulled out of the events
    // table's JSON props column and aggregated — the standard
    // schema-on-read step every log/telemetry pipeline runs. One pushed
    // projection + a map-side-combined aggregate; exact integers.
    QueryDef("q_json_props",
      (s, d) => table(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n_events,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // TF-IDF term statistics, integer-only (the order-sensitive float log
    // is left to the consumer): per-doc top-3 terms by (tf desc, df asc,
    // term asc). Exact ints hash-match across engines; the rank triple is
    // a total order so row_number is deterministic.
    QueryDef("q_tfidf_terms",
      (s, d) => TextAnalysis.topTermsFromTf(tfOf(s, d), k = 3)
        .orderBy(col("doc_id"), col("rnk")),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
             |df AS (SELECT term, COUNT(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY 1),
             |ranked AS (
             |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
             |         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
             |           ORDER BY tf.tf DESC, df.df ASC, tf.term ASC)::BIGINT AS rnk
             |  FROM tf JOIN df USING (term))
             |SELECT doc_id, term, tf, df, rnk FROM ranked WHERE rnk <= 3
             |ORDER BY doc_id, rnk""".stripMargin)),

    // Winnowing fingerprints: positional k-gram rolling hashes, sliding
    // window minima, distinct per doc — guarantees a shared fingerprint for
    // any common substring of length ≥ w+k−1. The windowed min is over
    // 8-hex-char strings, so both engines agree lexicographically.
    QueryDef("q_winnow_fingerprint",
      (s, d) => winnowOf(s, d)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_fps"),
          min(col("fp")).as("min_fp"), max(col("fp")).as("max_fp"))
        .orderBy(col("doc_id")),
      Some("""WITH pos AS (
             |  SELECT doc_id, i, substr(md5(substr(text, CAST(i AS INT), 8)), 1, 8) AS h
             |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 6, 2))) AS i
             |        FROM documents)),
             |win AS (
             |  SELECT doc_id,
             |         min(h) OVER (PARTITION BY doc_id ORDER BY i
             |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             |         i, count(*) OVER (PARTITION BY doc_id) AS n
             |  FROM pos),
             |fps AS (SELECT DISTINCT doc_id, fp FROM win WHERE i <= n - 3)
             |SELECT doc_id, count(*) AS n_fps, min(fp) AS min_fp, max(fp) AS max_fp
             |FROM fps GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // MOSS-style overlap report over the winnowing fingerprints: doc pairs
    // sharing >= 3 fingerprints after dropping boilerplate fps (present in
    // > 10 docs). Catches PARTIAL overlap — a copied span inside an
    // otherwise-different doc — that whole-doc hashing misses. The Spark
    // plan has no self-join at all: fp doc-lists group once, pairs expand
    // map-side from the sorted list (skew-bounded by the boilerplate cap),
    // and the pair count aggregates with map-side combine. The oracle
    // verifies with the plain self-join formulation.
    QueryDef("q_winnow_overlap",
      (s, d) => TextAnalysis.winnowOverlapPairs(winnowOf(s, d),
          minShared = 3, maxDocsPerFp = 10)
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""WITH pos AS (
             |  SELECT doc_id, i, substr(md5(substr(text, CAST(i AS INT), 8)), 1, 8) AS h
             |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 6, 2))) AS i
             |        FROM documents)),
             |win AS (
             |  SELECT doc_id,
             |         min(h) OVER (PARTITION BY doc_id ORDER BY i
             |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             |         i, count(*) OVER (PARTITION BY doc_id) AS n
             |  FROM pos),
             |fps AS (SELECT DISTINCT doc_id, fp FROM win WHERE i <= n - 3),
             |rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 10)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |       CAST(count(*) AS BIGINT) AS shared_fps
             |FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
             |WHERE a.fp IN (SELECT fp FROM rare)
             |GROUP BY 1, 2 HAVING count(*) >= 3
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Quality score in [0,1]: unique-token ratio + stopword presence + length
    // band, averaged. Pure map — no shuffle; the standard cheap pre-filter
    // before expensive dedup/classification passes.
    QueryDef("q_quality_score",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
             |     / greatest(CAST(len(string_split(text,' ')) AS DOUBLE), 1.0)
             |   + CASE WHEN len(list_filter(string_split(text,' '),
             |                  x -> x IN ('the','and','of'))) > 0 THEN 1.0 ELSE 0.0 END
             |   + CASE WHEN length(text) BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.0 END
             |  ) / 3.0 AS quality
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // BPE-ish token counting: word runs + standalone punctuation via one
    // regexp (GPT-style pre-tokenization) — codegen'd, zero shuffle.
    QueryDef("q_token_regex",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
          TextAnalysis.bpeishTokenCount(col("text")).as("n_bpeish"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
             |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_bpeish
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Tokenizer-vocab coverage: top-16 corpus vocabulary (freq desc, token
    // asc — a deterministic cut), then per-doc total vs in-vocab token
    // counts. OOV rate is downstream arithmetic; the corpus probes the
    // BROADCAST vocab, never shuffling on the token.
    QueryDef("q_vocab_oov",
      (s, d) => TextAnalysis.vocabCoverage(spreadDocs(s, d), vocabSize = 16)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
             |  FROM documents),
             |vocab AS (
             |  SELECT token FROM (
             |    SELECT token, count(*) AS c FROM toks GROUP BY token
             |    ORDER BY c DESC, token LIMIT 16))
             |SELECT t.doc_id, count(*) AS n_tokens,
             |       CAST(count(v.token) AS BIGINT) AS n_in_vocab
             |FROM toks t LEFT JOIN vocab v USING (token)
             |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin)),

    // Per-source exact token-length quantiles (rank-picked, no float
    // interpolation): the length-distribution report behind context-window
    // and training-mix design.
    QueryDef("q_length_quantiles",
      (s, d) => TextAnalysis.lengthQuantiles(table(s, d, "documents"))
        .orderBy(col("source")),
      Some("""WITH t AS (
             |  SELECT source,
             |         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
             |              AS BIGINT) AS n_tokens
             |  FROM documents),
             |r AS (
             |  SELECT source, n_tokens,
             |         row_number() OVER (PARTITION BY source ORDER BY n_tokens) AS rn,
             |         count(*) OVER (PARTITION BY source) AS n
             |  FROM t)
             |SELECT source, count(*) AS n_docs,
             |  max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN n_tokens END) AS p50,
             |  max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN n_tokens END) AS p90,
             |  max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN n_tokens END) AS p99
             |FROM r GROUP BY source ORDER BY source""".stripMargin)),

    // Within-doc repetition (Gopher-style quality rules): word-bigram total,
    // distinct count, and top single-bigram frequency per doc — the integer
    // cores of the duplicate-n-gram-fraction filters.
    QueryDef("q_repetition",
      (s, d) => TextAnalysis.repetitionStats(spreadDocs(s, d))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |bg AS (
             |  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bigram
             |  FROM t, unnest(range(1, len(tk))) AS r(i)
             |  WHERE len(tk) >= 2),
             |cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             |       count(*) AS n_uniq_bigrams, CAST(max(c) AS BIGINT) AS top_count
             |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Length-bucketed batching report: docs grouped into 32-token-wide
    // length buckets (the dynamic-batching layout trainers use so a batch
    // pads to its bucket max, not the corpus max), with the padding waste
    // each bucket would pay — all exact integers. One map-side-combined
    // aggregation on the derived bucket key.
    QueryDef("q_length_buckets",
      (s, d) => spreadDocs(s, d)
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tok"))
        .groupBy(floor((col("n_tok") - 1) / 32).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("n_tok")).as("max_tok"),
          sum(col("n_tok")).as("sum_tok"))
        .withColumn("padding_waste", col("n_docs") * col("max_tok") - col("sum_tok"))
        .orderBy(col("bucket")),
      Some("""SELECT (n_tok - 1) // 32 AS bucket, count(*) AS n_docs,
             |       max(n_tok) AS max_tok, CAST(sum(n_tok) AS BIGINT) AS sum_tok,
             |       CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS padding_waste
             |FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents)
             |GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // Token frequency-of-frequencies (the Zipf/Good-Turing spectrum): how
    // many distinct tokens occur exactly f times corpus-wide. Two chained
    // map-side-combined aggregations — the second one's key space is tiny
    // (distinct frequencies), so the corpus token stream shuffles once.
    QueryDef("q_token_spectrum",
      (s, d) => spreadDocs(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("f"))
        .groupBy(col("f")).agg(count(lit(1)).as("n_tokens"))
        .orderBy(col("f")),
      Some("""SELECT f, count(*) AS n_tokens
             |FROM (SELECT token, count(*) AS f
             |      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
             |      GROUP BY token)
             |GROUP BY f ORDER BY f""".stripMargin)),

    // Perplexity-filter core: per-doc surprisal under the corpus char-bigram
    // LM, quantized to exact integer bits (bitlen(ctx) − bitlen(bigram) per
    // occurrence) so the compare surface has no float log accumulation. The
    // charset²-sized model broadcasts; the only corpus exchange is the
    // per-doc aggregate.
    QueryDef("q_char_lm_surprisal",
      (s, d) => graft.llm.TextAnalysis.bigramSurprisal(spreadDocs(s, d))
        .orderBy(col("doc_id")),
      Some("""WITH bg AS (
             |  SELECT doc_id, substr(text, i, 2) AS bigram
             |  FROM (SELECT doc_id, text, unnest(range(1, length(text))) AS i
             |        FROM documents WHERE length(text) >= 2)),
             |m AS (SELECT bigram, count(*)::BIGINT AS c_big FROM bg GROUP BY 1),
             |cx AS (SELECT substr(bigram, 1, 1) AS ctx, sum(c_big)::BIGINT AS c_ctx
             |       FROM m GROUP BY 1)
             |SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
             |       sum(length(bin(cx.c_ctx)) - length(bin(m.c_big)))::BIGINT AS surprisal_bits
             |FROM bg JOIN m USING (bigram) JOIN cx ON substr(bg.bigram, 1, 1) = cx.ctx
             |GROUP BY bg.doc_id ORDER BY doc_id""".stripMargin)),

    // Tokenizer training primitive: top-50 adjacent char pairs within words
    // (the pair a BPE trainer merges first). Alphabet²-bounded aggregation
    // key → tiny exchange at any corpus size; top-k via TakeOrdered.
    QueryDef("q_bpe_merges",
      (s, d) => graft.llm.TextAnalysis.bpeMergeCandidates(
        table(s, d, "documents"), k = 50),
      Some("""SELECT substr(word, i, 2) AS pair, count(*)::BIGINT AS n
             |FROM (SELECT word, unnest(range(1, length(word))) AS i
             |      FROM (SELECT unnest(list_filter(string_split(text, ' '),
             |                            x -> x <> '')) AS word
             |            FROM documents)
             |      WHERE length(word) >= 2)
             |GROUP BY 1 ORDER BY n DESC, pair LIMIT 50""".stripMargin)),

    // BPE ENCODE at production-shaped depth: the 240-merge table folds as
    // ONE array-literal `aggregate` over DISTINCT words (constant plan
    // size however long the merge table; a containment guard skips the
    // ~6x of iterations whose pair can't fire), then joins the encodings
    // back onto the word stream — one distinct + one join exchange, work
    // sized by |vocab| not |corpus|. The oracle mirrors the chain as 240
    // generated CTEs; every word's symbol sequence must agree exactly.
    QueryDef("q_bpe_encode",
      (s, d) => graft.llm.TextAnalysis.bpeEncode(
          table(s, d, "documents"), BpeEncodeMerges)
        .select(col("doc_id"), col("word_idx"),
          concat_ws("|", col("symbols")).as("encoded"),
          size(col("symbols")).cast("long").as("n_symbols"))
        .orderBy(col("doc_id"), col("word_idx")),
      Some(bpeEncodeDuckSql)),

    // Filtering-threshold design: per-source quality deciles with doc/token
    // mass and score range per bucket — one stratum-keyed shuffle (never a
    // global ntile), map-side-combined rollup.
    QueryDef("q_quality_token_curve",
      (s, d) => graft.llm.TextAnalysis.qualityTokenCurve(
          table(s, d, "documents"), bins = 10)
        .orderBy(col("source"), col("qbin")),
      Some("""WITH s AS (
             |  SELECT source, doc_id,
             |    (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
             |       / greatest(CAST(len(string_split(text,' ')) AS DOUBLE), 1.0)
             |     + CASE WHEN len(list_filter(string_split(text,' '),
             |                    x -> x IN ('the','and','of'))) > 0 THEN 1.0 ELSE 0.0 END
             |     + CASE WHEN length(text) BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.0 END
             |    ) / 3.0 AS q,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS toks
             |  FROM documents),
             |b AS (SELECT source, q, toks,
             |        ntile(10) OVER (PARTITION BY source ORDER BY q, doc_id) AS qbin
             |      FROM s)
             |SELECT source, qbin::BIGINT AS qbin, count(*) AS n_docs,
             |       sum(toks)::BIGINT AS n_tokens, min(q) AS q_min, max(q) AS q_max
             |FROM b GROUP BY 1, 2 ORDER BY source, qbin""".stripMargin)),

    // PMI collocation mining: adjacent-pair PMI in integer bits (bitlen
    // quantization), minCount 5, top-50 by (pmi_bits desc, pair). Two
    // corpus explodes → two map-side-combined aggregates; unigram model
    // broadcasts back; TakeOrdered top-k.
    QueryDef("q_pmi_phrases",
      (s, d) => graft.llm.TextAnalysis.pmiPhrases(spreadDocs(s, d), k = 50)
        .orderBy(col("pmi_bits").desc, col("w1"), col("w2")),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
             |  FROM documents),
             |prs AS (
             |  SELECT t[i] AS w1, t[i + 1] AS w2
             |  FROM toks, unnest(range(1, len(t))) AS u(i)
             |  WHERE len(t) >= 2),
             |pc AS (SELECT w1, w2, count(*)::BIGINT AS c_pair FROM prs GROUP BY 1, 2),
             |uni AS (
             |  SELECT w, count(*)::BIGINT AS c
             |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
             |tot AS (SELECT (SELECT sum(c_pair)::BIGINT FROM pc) AS n_pairs,
             |               (SELECT sum(c)::BIGINT FROM uni) AS n_uni)
             |SELECT w1, w2, c_pair,
             |       (length(bin(c_pair)) + 2 * length(bin(n_uni))
             |        - length(bin(n_pairs)) - length(bin(u1.c))
             |        - length(bin(u2.c)))::BIGINT AS pmi_bits
             |FROM pc JOIN uni u1 ON pc.w1 = u1.w JOIN uni u2 ON pc.w2 = u2.w
             |CROSS JOIN tot
             |WHERE c_pair >= 5
             |ORDER BY pmi_bits DESC, w1, w2 LIMIT 50""".stripMargin)),

    // Phrase application (word2phrase inference): fuse the two most-frequent
    // corpus collocations greedily, sequentially — each phrase is one
    // linear indexed transform+filter pass (fuse where the successor
    // completes the pair, drop where the predecessor consumed it; l ≠ r
    // makes matches non-overlapping by construction). Output is the fused
    // text + token count (exact strings, engine-comparable).
    QueryDef("q_phrase_apply",
      (s, d) => graft.llm.TextAnalysis.applyPhrases(
          table(s, d, "documents"),
          Seq("table" -> "hash", "slow" -> "key"))
        .select(col("doc_id"), col("fused_text"),
          size(col("tokens")).cast("long").as("n_tokens"))
        .orderBy(col("doc_id")),
      Some("""WITH t0 AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents),
             |f1 AS (
             |  SELECT doc_id, list_filter(list_transform(toks, (t, i) ->
             |    CASE WHEN t = 'table' AND toks[i + 1] = 'hash' THEN 'table_hash'
             |         WHEN t = 'hash' AND toks[i - 1] = 'table' THEN NULL
             |         ELSE t END), x -> x IS NOT NULL) AS toks1
             |  FROM t0),
             |f2 AS (
             |  SELECT doc_id, list_filter(list_transform(toks1, (t, i) ->
             |    CASE WHEN t = 'slow' AND toks1[i + 1] = 'key' THEN 'slow_key'
             |         WHEN t = 'key' AND toks1[i - 1] = 'slow' THEN NULL
             |         ELSE t END), x -> x IS NOT NULL) AS toks2
             |  FROM f1)
             |SELECT doc_id, array_to_string(toks2, ' ') AS fused_text,
             |       CAST(len(toks2) AS BIGINT) AS n_tokens
             |FROM f2 ORDER BY doc_id""".stripMargin)),

    // BM25 ranked retrieval (Okapi weighting) over the shared TF artifact:
    // top-10 docs for a 3-term query. idf is integer-bitlen (ln is
    // libm-specific); the float normalization mirrors literal-for-literal
    // and the per-doc sum folds in term order — scores hash-match DuckDB.
    // The scan reads only the query terms' tf rows; df/N/avgdl broadcast.
    QueryDef("q_bm25",
      (s, d) => TextAnalysis.bm25(tfOf(s, d), Seq("hash", "spark", "window"),
        docLengths = Some(dlOf(s, d))),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
             |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
             |stats AS (SELECT count(*)::BIGINT AS n_docs,
             |                 sum(dl) / count(*) AS avgdl FROM dl),
             |df AS (SELECT term, count(*)::BIGINT AS df FROM tf
             |       WHERE term IN ('hash', 'spark', 'window') GROUP BY 1),
             |ts AS (
             |  SELECT tf.doc_id, tf.term,
             |         -- ::DOUBLE on every literal: DuckDB's bare 1.2/0.75 are
             |         -- DECIMAL, whose exact intermediates diverge from Spark's
             |         -- double arithmetic by 1 ulp at sf0.1 magnitudes
             |         (length(bin(n_docs)) - length(bin(df.df)))::DOUBLE *
             |           (tf.tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
             |           (tf.tf + 1.2::DOUBLE *
             |             (0.25::DOUBLE + 0.75::DOUBLE * dl.dl / stats.avgdl)) AS term_score
             |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
             |SELECT doc_id,
             |       list_reduce(list_prepend(0.0, list(term_score ORDER BY term)),
             |                   (a, b) -> a + b) AS bm25
             |FROM ts GROUP BY doc_id
             |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin)),

    // Supervised hashed-linear quality classifier (CCNet/fastText shape):
    // naive-Bayes bitlen log-odds TRAINED on the even-doc_id half (labels =
    // lang judgement), APPLIED frozen to the odd half — the train/apply
    // split a production filter runs. Train side is labeled-set-sized;
    // apply is one broadcast join on the token stream + one per-doc
    // aggregate (a single corpus exchange).
    QueryDef("q_quality_classifier",
      (s, d) => {
        val docs = table(s, d, "documents")
        val model = graft.llm.TextAnalysis.trainTextClassifier(
          docs.where(col("doc_id") % 2 === 0), isPositive = col("lang") === "en")
        graft.llm.TextAnalysis.applyTextClassifier(
            docs.where(col("doc_id") % 2 === 1), model)
          .orderBy(col("doc_id"))
      },
      Some("""WITH trt AS (
             |  SELECT lang = 'en' AS is_pos,
             |         ('0x' || substr(md5(token), 1, 2))::INT AS b
             |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
             |        FROM documents WHERE doc_id % 2 = 0)
             |  WHERE token <> ''),
             |counts AS (
             |  SELECT b, sum(CASE WHEN is_pos THEN 1 ELSE 0 END)::BIGINT AS c_pos,
             |            sum(CASE WHEN is_pos THEN 0 ELSE 1 END)::BIGINT AS c_neg
             |  FROM trt GROUP BY b),
             |tot AS (SELECT sum(c_pos)::BIGINT AS n_pos,
             |               sum(c_neg)::BIGINT AS n_neg FROM counts),
             |model AS (
             |  SELECT b, (length(bin(c_pos + 1)) - length(bin(c_neg + 1))
             |           + length(bin(n_neg + 1)) - length(bin(n_pos + 1)))::BIGINT AS w_bits
             |  FROM counts CROSS JOIN tot),
             |apl AS (
             |  SELECT doc_id, ('0x' || substr(md5(token), 1, 2))::INT AS b
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |        FROM documents WHERE doc_id % 2 = 1)
             |  WHERE token <> '')
             |SELECT doc_id, count(*)::BIGINT AS n_tokens,
             |       sum(coalesce(w_bits, 0))::BIGINT AS score_bits,
             |       (sum(coalesce(w_bits, 0)) >= 0)::INT AS pred_pos
             |FROM apl LEFT JOIN model USING (b)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Blocklist filter (C4 bad-words rule): occurrence + distinct-term hit
    // counts against a literal blocklist, keep = zero hits. Pure map — the
    // list compiles into the scan, no join or shuffle anywhere.
    QueryDef("q_blocklist",
      (s, d) => graft.llm.TextAnalysis.blocklistFilter(
          table(s, d, "documents"), Seq("slow", "merge", "broken"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(string_split(text, ' '),
             |       x -> x IN ('slow', 'merge', 'broken'))) AS BIGINT) AS n_hits,
             |  CAST(len(list_filter(list_distinct(string_split(text, ' ')),
             |       x -> x IN ('slow', 'merge', 'broken'))) AS BIGINT) AS n_distinct_hits,
             |  CAST(len(list_filter(string_split(text, ' '),
             |       x -> x IN ('slow', 'merge', 'broken'))) = 0 AS INT) AS keep
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
