package graft.queries

import graft.llm.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import QueryDef.table
import LlmArtifacts._

/** Deduplication family over `documents`/`embeddings`: exact/normalized/window hash dedup, MinHash-LSH, SimHash, perceptual dHash, SemDeDup, span/chunk dedup, decontamination, novelty — plus the end-to-end corpus-prep composite.
  * Split out of the former monolithic LlmQueries registry; shared index
  * artifacts live in [[LlmArtifacts]]. See that object for the scale notes
  * common to the family. */
private[queries] object LlmDedupQueries {

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
    // The wide signature frame is the shared, cached index artifact —
    // deployments persist it; the whole LSH family below reuses it instead
    // of re-shingling the corpus per query.
    QueryDef("q_minhash_sigs",
      (s, d) => sigsOf(s, d)
        .selectExpr("doc_id", "stack(4, 0, mh0, 1, mh1, 2, mh2, 3, mh3) AS (seed, mh)")
        .orderBy(col("doc_id"), col("seed")),
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
      (s, d) => pairsOf(s, d).orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $sigsWideDuckSql,
              |$bandsDuckSql
              |SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin)),

    // Corpus snapshot diff — release governance: snapshot B derives from
    // the documents table (every 7th doc edited, every 11th dropped, a
    // synthetic tail added), and the diff labels each id
    // added/removed/changed/unchanged from (id, hash) projections alone.
    QueryDef("q_corpus_diff",
      (s, d) => {
        val a = table(s, d, "documents")
        val b = a.where(col("doc_id") % 11 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")).as("text"))
          .unionByName(a.where(col("doc_id") % 13 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        graft.llm.Dedup.corpusDiff(a, b).orderBy(col("doc_id"))
      },
      Some("""WITH a AS (SELECT doc_id, md5(text) AS h FROM documents),
             |b AS (
             |  SELECT doc_id,
             |         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS h
             |  FROM documents WHERE doc_id % 11 <> 0
             |  UNION ALL
             |  SELECT doc_id + 1000000, md5(text) FROM documents WHERE doc_id % 13 = 0)
             |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             |       CASE WHEN a.h IS NULL THEN 'added'
             |            WHEN b.h IS NULL THEN 'removed'
             |            WHEN a.h <> b.h THEN 'changed'
             |            ELSE 'unchanged' END AS status
             |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // Train/val SPLIT-LEAKAGE audit — the internal twin of benchmark
    // decontamination: deterministic salted-hash split labels, then the
    // banding-bounded candidate pairs that STRADDLE the split (a val doc
    // near-duplicated in train is leaked eval signal; external decontam
    // cannot see it). The corpus is never re-shingled — two id equi-joins
    // over the persisted pair artifact.
    QueryDef("q_split_leakage",
      (s, d) => graft.llm.Sampling.splitLeakage(
          graft.llm.Sampling.splitAssign(table(s, d, "documents")),
          pairsOf(s, d))
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $sigsWideDuckSql,
              |$bandsDuckSql,
              |splits AS (
              |  SELECT doc_id,
              |         CASE WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
              |              THEN 'train' ELSE 'val' END AS split
              |  FROM documents)
              |SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b
              |FROM pairs p
              |JOIN splits sa ON sa.doc_id = p.doc_a
              |JOIN splits sb ON sb.doc_id = p.doc_b
              |WHERE sa.split <> sb.split
              |ORDER BY p.doc_a, p.doc_b""".stripMargin)),

    // Token-Jaccard on the LSH candidates: |A∩B| plus set sizes (exact ints;
    // the ratio is downstream arithmetic).
    QueryDef("q_jaccard_lsh",
      (s, d) => Dedup.setJaccardOnPairs(
          setsOf("token", tokensOf(s, d), "token", d), pairsOf(s, d))
        .orderBy(col("doc_a"), col("doc_b")),
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
    // token hashes → compact near-dup fingerprint. The signature frame is a
    // cached artifact shared with the pair-retrieval query below.
    QueryDef("q_simhash",
      (s, d) => simhashOf(s, d).orderBy(col("doc_id")),
      Some(s"""WITH $simhashDuckSql
              |SELECT doc_id, simhash FROM sims ORDER BY doc_id""".stripMargin)),

    // SimHash candidate pairs: four 4-bit bands (pigeonhole: hamming ≤ 3
    // leaves at least one band untouched — LOSSLESS retrieval at this
    // threshold) + popcount-verified Hamming distance.
    QueryDef("q_simhash_pairs",
      (s, d) => Dedup.simhashPairs(simhashOf(s, d), maxHamming = 3)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $simhashDuckSql,
              |banded AS (
              |  SELECT doc_id, simhash,
              |         (simhash // 1) % 16 AS b0, (simhash // 16) % 16 AS b1,
              |         (simhash // 256) % 16 AS b2, (simhash // 4096) % 16 AS b3
              |  FROM sims),
              |cand AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |         a.simhash AS sim_a, b.simhash AS sim_b
              |  FROM banded a JOIN banded b ON a.b0 = b.b0 AND a.doc_id < b.doc_id
              |  UNION SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
              |  FROM banded a JOIN banded b ON a.b1 = b.b1 AND a.doc_id < b.doc_id
              |  UNION SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
              |  FROM banded a JOIN banded b ON a.b2 = b.b2 AND a.doc_id < b.doc_id
              |  UNION SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
              |  FROM banded a JOIN banded b ON a.b3 = b.b3 AND a.doc_id < b.doc_id)
              |SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
              |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // Multimodal plumbing (metadata side): opaque-bytes length + a
    // deterministic md5-derived content key. (Image decode itself is REAL
    // via javax.imageio — see the decode queries below; only audio/video
    // remain stubbed in graft.llm.Multimodal.)
    QueryDef("q_multimodal_meta",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          substring(md5(col("text")), 1, 8).as("content_key"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
             |       substr(md5(text), 1, 8) AS content_key
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Content-aware image near-dup: dHash perceptual fingerprint over an
    // 8×8 grayscale grid (the embedding vectors quantized to gray levels —
    // the container-safe stand-in for a decoded raster), then banded
    // Hamming retrieval (14 bands × 4 bits — lossless for hamming ≤ 13 by
    // pigeonhole) + exact popcount verify. The oracle does the O(n²) join;
    // Spark's plan is ONE equi-join on the banded key — never a cross
    // product. Exact integers end to end, so the hash compare is strict.
    QueryDef("q_image_neardup",
      (s, d) => {
        Dedup.bandedHammingPairs(dhashOf(s, d), bits = 56, bandBits = 4,
            maxHamming = 13, idCol = "vec_id", hashCol = "dhash")
          .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"), col("hamming"))
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some("""WITH px AS (
             |  SELECT vec_id,
             |         list_transform(embedding, v ->
             |           CAST(floor((CAST(v AS DOUBLE) + 1.0) * 127.5) AS INT)) AS p
             |  FROM embeddings),
             |h AS (
             |  SELECT vec_id,
             |         CAST(list_sum(list_transform(range(0, 56), i ->
             |           CASE WHEN p[CAST((i // 7) * 8 + (i % 7) + 1 AS INT)]
             |                     < p[CAST((i // 7) * 8 + (i % 7) + 2 AS INT)]
             |                THEN CAST(1 AS BIGINT) << CAST(i AS INT)
             |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS dhash
             |  FROM px)
             |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |       CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
             |FROM h a JOIN h b ON a.vec_id < b.vec_id
             |WHERE bit_count(xor(a.dhash, b.dhash)) <= 13
             |ORDER BY vec_a, vec_b""".stripMargin)),

    // The SAME perceptual pipeline with a REAL codec in the path: the grids
    // are encoded to actual PNG bytes and decoded back through the JDK's
    // javax.imageio (Multimodal.ImageIoCodec) before hashing — Spark
    // decodes real image payloads while DuckDB reads the pre-extracted
    // pixel grids (the embeddings). Any encode/decode corruption (wrong
    // raster mapping, colorspace drift, off-by-one row order) changes a
    // dhash and hash-mismatches against q_image_neardup's oracle.
    QueryDef("q_image_decode_neardup",
      (s, d) => {
        Dedup.bandedHammingPairs(decodedDhashOf(s, d), bits = 56, bandBits = 4,
            maxHamming = 13, idCol = "media_id", hashCol = "dhash")
          .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"), col("hamming"))
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some("""WITH px AS (
             |  SELECT vec_id,
             |         list_transform(embedding, v ->
             |           CAST(floor((CAST(v AS DOUBLE) + 1.0) * 127.5) AS INT)) AS p
             |  FROM embeddings),
             |h AS (
             |  SELECT vec_id,
             |         CAST(list_sum(list_transform(range(0, 56), i ->
             |           CASE WHEN p[CAST((i // 7) * 8 + (i % 7) + 1 AS INT)]
             |                     < p[CAST((i // 7) * 8 + (i % 7) + 2 AS INT)]
             |                THEN CAST(1 AS BIGINT) << CAST(i AS INT)
             |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS dhash
             |  FROM px)
             |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |       CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
             |FROM h a JOIN h b ON a.vec_id < b.vec_id
             |WHERE bit_count(xor(a.dhash, b.dhash)) <= 13
             |ORDER BY vec_a, vec_b""".stripMargin)),

    // MIXED-CONTAINER decode: the same perceptual pipeline over a corpus
    // whose payloads are png / bmp / gif by vec_id % 3 — three real JDK
    // codecs behind the ONE container-sniffing decode path. All three are
    // gray-lossless, so the result must be IDENTICAL to the pure-grid
    // oracle; a per-format decode defect (BMP row order, GIF palette
    // drift) hash-mismatches exactly like a PNG one would.
    QueryDef("q_image_mixed_decode_neardup",
      (s, d) => {
        Dedup.bandedHammingPairs(mixedDecodedDhashOf(s, d), bits = 56, bandBits = 4,
            maxHamming = 13, idCol = "media_id", hashCol = "dhash")
          .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"), col("hamming"))
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some("""WITH px AS (
             |  SELECT vec_id,
             |         list_transform(embedding, v ->
             |           CAST(floor((CAST(v AS DOUBLE) + 1.0) * 127.5) AS INT)) AS p
             |  FROM embeddings),
             |h AS (
             |  SELECT vec_id,
             |         CAST(list_sum(list_transform(range(0, 56), i ->
             |           CASE WHEN p[CAST((i // 7) * 8 + (i % 7) + 1 AS INT)]
             |                     < p[CAST((i // 7) * 8 + (i % 7) + 2 AS INT)]
             |                THEN CAST(1 AS BIGINT) << CAST(i AS INT)
             |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS dhash
             |  FROM px)
             |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |       CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
             |FROM h a JOIN h b ON a.vec_id < b.vec_id
             |WHERE bit_count(xor(a.dhash, b.dhash)) <= 13
             |ORDER BY vec_a, vec_b""".stripMargin)),

    // JPEG — the one LOSSY JDK codec — gated by reconstruction tolerance
    // instead of bit-exactness: encode every grid at quality 1.0, decode,
    // and require max |decoded − source| ≤ 8 gray levels per image (probed
    // headroom: ≤ 2 on 8×8 gray blocks at q=1.0; a colorspace/row-order
    // defect blows through 8 immediately, so the boolean is a real decode
    // gate even though DuckDB never sees JPEG bytes). Dimensions are exact
    // regardless of lossiness. The join is an equi-join on the id — never
    // a cross product; at scale both sides partition by id.
    QueryDef("q_image_jpeg_roundtrip",
      (s, d) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        // NOTE (r14, measured): spreading this scan across the cluster
        // (spreadEmbeddings) was tried and REVERTED — the 8x8-grid codec
        // work is tiny (<1 task-second for the whole table), and 32-way
        // parallelism multiplied the per-task fixed cost of the javax
        // imageio/codec path ~16x (q_image_resize taskSec 0.9 -> 17.9,
        // q_video_summary wall 0.59 -> 1.23). A real multi-file corpus
        // splits at the reader; forcing a shuffle here buys nothing.
        val grids = graft.llm.Multimodal.grayscaleGrid(
          table(s, d, "embeddings"), "vec_id", "embedding")
        val jpg = graft.llm.Multimodal.encodeGrayGridAssets(grids, w = 8, h = 8,
          format = _ => "jpg")
        val decoded = graft.llm.Multimodal.decodeGrayGrid(jpg)
        decoded.join(
            grids.select(col("vec_id").as("media_id"), col("px").as("src_px")),
            Seq("media_id"))
          .select(col("media_id").as("vec_id"), col("w"), col("h"),
            (expr("array_max(zip_with(px, src_px, (a, b) -> abs(a - b)))") <= lit(8))
              .as("within_tol"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id, 8 AS w, 8 AS h, TRUE AS within_tol
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // REAL resize in the path: grid → actual PNG bytes → JDK decode →
    // 2×2 integer box-mean downscale in codegen'd array functions (no
    // UDF, exact arithmetic). DuckDB recomputes the means straight from
    // the pre-extracted pixel grids, so a codec defect OR a box-indexing
    // defect (row-major mix-up, off-by-one crop) hash-mismatches.
    QueryDef("q_image_resize",
      (s, d) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        // NOTE (r14, measured): spreading this scan across the cluster
        // (spreadEmbeddings) was tried and REVERTED — the 8x8-grid codec
        // work is tiny (<1 task-second for the whole table), and 32-way
        // parallelism multiplied the per-task fixed cost of the javax
        // imageio/codec path ~16x (q_image_resize taskSec 0.9 -> 17.9,
        // q_video_summary wall 0.59 -> 1.23). A real multi-file corpus
        // splits at the reader; forcing a shuffle here buys nothing.
        val grids = graft.llm.Multimodal.grayscaleGrid(
          table(s, d, "embeddings"), "vec_id", "embedding")
        val png = graft.llm.Multimodal.encodePngGrid(grids, w = 8, h = 8)
        // The pixel array is projected to a CSV scalar in the DECLARED
        // output (r15): the driver's comparator canonicalizes rows with
        // pandas sort_values, which cannot factorize ndarray cells — the
        // raw array column made the query unverifiable (r14 verdict item
        // 1). Every pixel value still rides the string, so any codec or
        // box-indexing defect still hash-mismatches.
        graft.llm.Multimodal.downscaleGrayGrid(
            graft.llm.Multimodal.decodeGrayGrid(png), f = 2)
          .select(col("media_id").as("vec_id"), col("w"), col("h"),
            expr("array_join(transform(px, v -> CAST(v AS STRING)), ',')")
              .as("px_csv"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH px AS (
             |  SELECT vec_id, list_transform(embedding, v ->
             |         CAST(floor((CAST(v AS DOUBLE) + 1.0) * 127.5) AS INT)) AS p
             |  FROM embeddings)
             |SELECT vec_id, 4 AS w, 4 AS h,
             |       array_to_string(list_transform(range(0, 16), j ->
             |         CAST(CAST(((p[CAST((j // 4) * 16 + (j % 4) * 2 + 1 AS INT)]
             |              + p[CAST((j // 4) * 16 + (j % 4) * 2 + 2 AS INT)]
             |              + p[CAST((j // 4) * 16 + (j % 4) * 2 + 9 AS INT)]
             |              + p[CAST((j // 4) * 16 + (j % 4) * 2 + 10 AS INT)]) // 4) AS INT) AS VARCHAR)), ',') AS px_csv
             |FROM px ORDER BY vec_id""".stripMargin)),

    // REAL audio in the path: deterministic integer waveforms → actual
    // RIFF/WAVE containers (Multimodal.WavCodec) → the JDK's AudioSystem
    // parser → exact-DSP features (integer duration/peak/zero-crossings,
    // IEEE-exact RMS). DuckDB recomputes the same features straight from
    // the waveform definition, so any container/framing/decode defect
    // (header arithmetic, endianness, frame width, a dropped sample)
    // shifts a feature and hash-mismatches. Sample rate varies per asset
    // to exercise the format header, not just the data chunk.
    QueryDef("q_audio_wav_features",
      (s, d) => {
        import s.implicits._
        val media = table(s, d, "documents").select(col("doc_id"))
          .where(col("doc_id") <= 64)
          .as[Long]
          .mapPartitions(_.map { id =>
            val n = (200 + id % 57).toInt
            val rate = (8000 * (1 + id % 3)).toInt
            val samples = Array.tabulate(n)(i =>
              (((id * 31 + i.toLong * 7) % 65536) - 32768).toShort)
            (id, graft.llm.Multimodal.WavCodec.encodePcm16(samples, rate))
          })
          .toDF("media_id", "payload")
        graft.llm.Multimodal.audioFeatures(media).orderBy(col("media_id"))
      },
      Some("""WITH ids AS (
             |  SELECT doc_id AS media_id, 200 + (doc_id % 57) AS n,
             |         8000 * (1 + (doc_id % 3)) AS rate
             |  FROM documents WHERE doc_id <= 64),
             |smp AS (
             |  SELECT media_id, n, rate, i,
             |         ((media_id * 31 + i * 7) % 65536) - 32768 AS v
             |  FROM ids, unnest(range(0, n)) AS u(i)),
             |marked AS (
             |  SELECT media_id, n, rate, v,
             |         CASE WHEN v * lag(v) OVER (PARTITION BY media_id ORDER BY i) < 0
             |              THEN 1 ELSE 0 END AS x
             |  FROM smp)
             |SELECT media_id, CAST(any_value(rate) AS INT) AS sample_rate,
             |       CAST(any_value(n) AS BIGINT) AS n_samples,
             |       CAST((any_value(n) * 1000) // any_value(rate) AS BIGINT) AS duration_ms,
             |       CAST(max(abs(v)) AS BIGINT) AS peak,
             |       CAST(sum(x) AS BIGINT) AS zero_crossings,
             |       sqrt(CAST(sum(v * v) AS DOUBLE) / CAST(any_value(n) AS DOUBLE)) AS rms
             |FROM marked GROUP BY media_id ORDER BY media_id""".stripMargin)),

    // REAL video in the path, BIT-EXACT: gray grids → PNG frames → muxed
    // into actual AVI containers (Multimodal.AviCodec, fourcc MPNG — Motion
    // PNG, gray-lossless) → RIFF demux + per-frame JDK decode → per-frame
    // dHash. Frame order is id-asc within each 8-frame video, so
    // media_id·8 + frame_no recovers the source vec_id and the fingerprints
    // must equal the pure-grid derivation EXACTLY — a chunk-size error, a
    // missing RIFF pad byte, a stale idx1 entry, or frame re-ordering
    // hash-mismatches. The mux groupByKey shuffles only the 8×8 grids.
    QueryDef("q_video_frame_dhash",
      (s, d) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        // NOTE (r14, measured): spreading this scan across the cluster
        // (spreadEmbeddings) was tried and REVERTED — the 8x8-grid codec
        // work is tiny (<1 task-second for the whole table), and 32-way
        // parallelism multiplied the per-task fixed cost of the javax
        // imageio/codec path ~16x (q_image_resize taskSec 0.9 -> 17.9,
        // q_video_summary wall 0.59 -> 1.23). A real multi-file corpus
        // splits at the reader; forcing a shuffle here buys nothing.
        val grids = graft.llm.Multimodal.grayscaleGrid(
          table(s, d, "embeddings"), "vec_id", "embedding")
        val avis = graft.llm.Multimodal.encodeGridVideos(grids, w = 8, h = 8,
          framesPer = 8, fps = 25, fourcc = "MPNG")
        val frames = graft.llm.Multimodal.decodeVideoFrames(avis)
          .select((col("media_id") * 8 + col("frame_no")).as("vec_id"), col("px"))
        graft.llm.Multimodal.dHash(frames, w = 8, h = 8,
            idCol = "vec_id", pxCol = "px")
          .orderBy(col("vec_id"))
      },
      Some("""WITH px AS (
             |  SELECT vec_id,
             |         list_transform(embedding, v ->
             |           CAST(floor((CAST(v AS DOUBLE) + 1.0) * 127.5) AS INT)) AS p
             |  FROM embeddings)
             |SELECT vec_id,
             |       CAST(list_sum(list_transform(range(0, 56), i ->
             |         CASE WHEN p[CAST((i // 7) * 8 + (i % 7) + 1 AS INT)]
             |                   < p[CAST((i // 7) * 8 + (i % 7) + 2 AS INT)]
             |              THEN CAST(1 AS BIGINT) << CAST(i AS INT)
             |              ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS dhash
             |FROM px ORDER BY vec_id""".stripMargin)),

    // The MJPG (Motion JPEG) form of the same pipeline — the one LOSSY
    // video fourcc, gated like q_image_jpeg_roundtrip: every demuxed frame
    // must reconstruct its source grid within 8 gray levels (probed
    // headroom ≤ 2 at q=1.0). Dimensions and the id↔(video, frame) mapping
    // stay exact regardless of lossiness, so a demux defect still shifts
    // rows and hash-mismatches even though the boolean absorbs DCT error.
    QueryDef("q_video_mjpeg_roundtrip",
      (s, d) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        // NOTE (r14, measured): spreading this scan across the cluster
        // (spreadEmbeddings) was tried and REVERTED — the 8x8-grid codec
        // work is tiny (<1 task-second for the whole table), and 32-way
        // parallelism multiplied the per-task fixed cost of the javax
        // imageio/codec path ~16x (q_image_resize taskSec 0.9 -> 17.9,
        // q_video_summary wall 0.59 -> 1.23). A real multi-file corpus
        // splits at the reader; forcing a shuffle here buys nothing.
        val grids = graft.llm.Multimodal.grayscaleGrid(
          table(s, d, "embeddings"), "vec_id", "embedding")
        val avis = graft.llm.Multimodal.encodeGridVideos(grids, w = 8, h = 8,
          framesPer = 8, fps = 25, fourcc = "MJPG")
        graft.llm.Multimodal.decodeVideoFrames(avis)
          .select((col("media_id") * 8 + col("frame_no")).as("vec_id"),
            col("w"), col("h"), col("px"))
          .join(grids.select(col("vec_id").cast("long").as("vec_id"),
            col("px").as("src_px")), Seq("vec_id"))
          .select(col("vec_id"), col("w"), col("h"),
            (expr("array_max(zip_with(px, src_px, (a, b) -> abs(a - b)))") <= lit(8))
              .as("within_tol"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id, 8 AS w, 8 AS h, TRUE AS within_tol
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // Header/stream metadata pass off the demuxer alone (no pixel decode) —
    // frame-period, geometry, fourcc, and the per-video frame count,
    // including the short FINAL video (500 % 8 = 4 frames), which gates the
    // muxer's header arithmetic (avih dwTotalFrames / strh dwLength) and
    // the uneven-group path end-to-end.
    QueryDef("q_video_summary",
      (s, d) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        // NOTE (r14, measured): spreading this scan across the cluster
        // (spreadEmbeddings) was tried and REVERTED — the 8x8-grid codec
        // work is tiny (<1 task-second for the whole table), and 32-way
        // parallelism multiplied the per-task fixed cost of the javax
        // imageio/codec path ~16x (q_image_resize taskSec 0.9 -> 17.9,
        // q_video_summary wall 0.59 -> 1.23). A real multi-file corpus
        // splits at the reader; forcing a shuffle here buys nothing.
        val grids = graft.llm.Multimodal.grayscaleGrid(
          table(s, d, "embeddings"), "vec_id", "embedding")
        val avis = graft.llm.Multimodal.encodeGridVideos(grids, w = 8, h = 8,
          framesPer = 8, fps = 25, fourcc = "MPNG")
        graft.llm.Multimodal.videoSummary(avis)
          .withColumn("n_frames", col("n_frames").cast("long"))
          .orderBy(col("media_id"))
      },
      Some("""SELECT vec_id // 8 AS media_id, 8 AS w, 8 AS h,
             |       40000 AS us_per_frame, 'MPNG' AS fourcc,
             |       count(*) AS n_frames
             |FROM embeddings GROUP BY vec_id // 8 ORDER BY media_id""".stripMargin)),

    // Window-function survivor pick: rank within each content group, keep
    // rank 1 — the one-pass dedup shape when whole rows must survive.
    QueryDef("q_dedup_window",
      (s, d) => Dedup.survivors(table(s, d, "documents"))
        .select(col("doc_id"), md5(col("text")).as("content_hash"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, md5(text) AS content_hash FROM documents
             |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
             |ORDER BY doc_id""".stripMargin)),

    // Embedding-cosine near-dup: random-hyperplane LSH buckets (planes = 4
    // fixed corpus vectors), pairwise cosine ONLY within a bucket — candidate
    // generation is a join on the 4-bit signature, never O(n²).
    QueryDef("q_embed_neardup",
      (s, d) => Dedup.nearDupsFromBuckets(bucketsOf(s, d), threshold = 0.3)
        .orderBy(col("vec_a"), col("vec_b")),
      Some("""WITH planes AS (
             |  SELECT vec_id AS plane_id, embedding::DOUBLE[] AS plane
             |  FROM embeddings WHERE vec_id BETWEEN 1 AND 4),
             |sig AS (
             |  SELECT e.vec_id,
             |         string_agg(CASE WHEN list_cosine_similarity(e.embedding::DOUBLE[], p.plane) >= 0
             |                         THEN '1' ELSE '0' END, '' ORDER BY p.plane_id) AS bucket
             |  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id),
             |b AS (SELECT s.vec_id, s.bucket, e.embedding FROM sig s JOIN embeddings e USING (vec_id))
             |SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
             |       list_cosine_similarity(a.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos_sim
             |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
             |WHERE list_cosine_similarity(a.embedding::DOUBLE[], c.embedding::DOUBLE[]) >= 0.3
             |ORDER BY vec_a, vec_b""".stripMargin)),

    // Duplicate-cluster resolution: connected components over the LSH
    // candidate-pair graph; each doc gets its component's min doc id as the
    // canonical survivor. Spark side = iterative min-label propagation;
    // oracle = recursive CTE over the same edges.
    QueryDef("q_dedup_clusters",
      (s, d) => clustersOf(s, d).orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE $sigsWideDuckSql,
              |$bandsDuckSql,
              |edges AS (
              |  SELECT doc_a AS s, doc_b AS d FROM pairs
              |  UNION ALL SELECT doc_b, doc_a FROM pairs),
              |cc(doc, lbl) AS (
              |  SELECT s, s FROM edges
              |  UNION
              |  SELECT e.s, cc.lbl FROM edges e JOIN cc ON cc.doc = e.d)
              |SELECT doc AS doc_id, min(lbl) AS cluster_id
              |FROM cc GROUP BY doc ORDER BY doc_id""".stripMargin)),

    // Survivor selection over the duplicate clusters: the longest doc
    // (n_chars desc, doc_id asc tie) survives each component — the
    // quality-ranked dedup decision production pipelines make (min-id,
    // q_dedup_clusters' label, is the degenerate case).
    QueryDef("q_dedup_survivors",
      (s, d) => Dedup.resolveSurvivors(
          clustersOf(s, d), table(s, d, "documents").select("doc_id", "n_chars"),
          Seq(col("n_chars").desc, col("doc_id")))
        .select(col("cluster_id"), col("doc_id"), col("n_chars"))
        .orderBy(col("cluster_id")),
      Some(s"""WITH RECURSIVE $sigsWideDuckSql,
              |$bandsDuckSql,
              |edges AS (
              |  SELECT doc_a AS s, doc_b AS d FROM pairs
              |  UNION ALL SELECT doc_b, doc_a FROM pairs),
              |cc(doc, lbl) AS (
              |  SELECT s, s FROM edges
              |  UNION
              |  SELECT e.s, cc.lbl FROM edges e JOIN cc ON cc.doc = e.d),
              |clusters AS (
              |  SELECT doc AS doc_id, min(lbl) AS cluster_id FROM cc GROUP BY doc)
              |SELECT c.cluster_id, c.doc_id, d.n_chars
              |FROM clusters c JOIN documents d USING (doc_id)
              |QUALIFY row_number() OVER (PARTITION BY c.cluster_id
              |  ORDER BY d.n_chars DESC, c.doc_id) = 1
              |ORDER BY cluster_id""".stripMargin)),

    // Benchmark decontamination: docs with doc_id % 25 = 0 stand in for the
    // held-out eval set; every other doc reports how many of its distinct
    // 8-gram shingles appear anywhere in that set. The benchmark gram set
    // broadcasts (eval sets are tiny next to a training corpus), so the
    // corpus side is one pass with zero gram-keyed shuffles.
    QueryDef("q_decontam",
      (s, d) => {
        val grams = gramsOf(s, d)
        Dedup.benchmarkOverlap(
            grams.where(col("doc_id") % 25 =!= 0),
            grams.where(col("doc_id") % 25 === 0))
          .orderBy(col("doc_id"))
      },
      Some("""WITH g AS (
             |  SELECT DISTINCT doc_id, substr(text, i, 8) AS gram
             |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 6, 2))) AS i
             |        FROM documents)),
             |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 25 = 0),
             |c AS (SELECT doc_id, gram FROM g WHERE doc_id % 25 <> 0)
             |SELECT c.doc_id, count(*) AS n_grams,
             |       CAST(count(b.gram) AS BIGINT) AS n_contaminated
             |FROM c LEFT JOIN b USING (gram)
             |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin)),

    // Bloom-prefiltered decontamination — the benchmark-too-big-to-
    // broadcast shape: the benchmark grams ship as a Bloom REGISTER frame
    // (bounded by min(k·n, m) rows whatever the benchmark size), the
    // corpus vocabulary probes it map-only, and only the maybe-present
    // sliver reaches the exact verify join. Output is EXACTLY the exact
    // decontam (no false negatives by construction, false positives
    // killed by the verify), so the oracle is the plain n-gram join —
    // any Bloom bit-carve error surfaces as a hash mismatch.
    QueryDef("q_bloom_decontam",
      (s, d) => {
        val grams = gramsOf(s, d)
        Dedup.benchmarkOverlapPrefiltered(
            grams.where(col("doc_id") % 20 =!= 0),
            grams.where(col("doc_id") % 20 === 0))
          .orderBy(col("doc_id"))
      },
      Some("""WITH g AS (
             |  SELECT DISTINCT doc_id, substr(text, i, 8) AS gram
             |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 6, 2))) AS i
             |        FROM documents)),
             |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
             |c AS (SELECT doc_id, gram FROM g WHERE doc_id % 20 <> 0)
             |SELECT c.doc_id, count(*) AS n_grams,
             |       CAST(count(b.gram) AS BIGINT) AS n_contaminated
             |FROM c LEFT JOIN b USING (gram)
             |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin)),

    // First-occurrence novelty: per doc, distinct shingles and how many
    // occur in no lower-id doc — the ingest-order novelty curve. No
    // corpus×corpus gram join: min-doc per gram re-aggregates by that doc,
    // then a docs-sized join against the per-doc totals.
    QueryDef("q_novelty",
      (s, d) => Dedup.noveltyStats(gramsOf(s, d)).orderBy(col("doc_id")),
      Some("""WITH g AS (
             |  SELECT DISTINCT doc_id, substr(text, i, 8) AS gram
             |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 6, 2))) AS i
             |        FROM documents)),
             |perdoc AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM g GROUP BY 1),
             |novel AS (
             |  SELECT doc_id, count(*)::BIGINT AS n_novel
             |  FROM (SELECT gram, min(doc_id) AS doc_id FROM g GROUP BY 1)
             |  GROUP BY 1)
             |SELECT doc_id, n_grams, coalesce(n_novel, 0)::BIGINT AS n_novel
             |FROM perdoc LEFT JOIN novel USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // The END-TO-END corpus-preparation pass, composed from the tested
    // operators in production order: exact-dedup survivors (window, full
    // rows) → integer quality gate (≥20 tokens, distinct-token ratio ≥ 1/3 —
    // Gopher-style repetition rule in exact arithmetic) → deterministic
    // stratified sample (salted-hash threshold per source class) → packed
    // sequence layout. Every stage is individually oracle-gated elsewhere;
    // this query gates the COMPOSITION — offsets downstream of three
    // filters, where any divergence in any stage moves every later number.
    // Shape: two shuffles total (dedup window by content hash; packing by
    // (stream, sub)) — the quality gate and the sample are residual-free
    // maps fused into the scans between them.
    QueryDef("q_corpus_prep",
      (s, d) => {
        val toks = filter(split(col("text"), " "), t => t =!= "")
        val quality = Dedup.survivors(table(s, d, "documents"))
          .where(size(toks) >= 20 && size(array_distinct(toks)) * 3 >= size(toks))
        val thr = {
          val cls = expr("try_cast(substr(source, 4) AS INT)") % 4
          when(cls === 0, "40").when(cls === 1, "80")
            .when(cls === 2, "c0").otherwise("zz")
        }
        graft.llm.Sampling.packSequences(
            graft.llm.Sampling.stratifiedSample(quality, thr),
            capacity = 512, subStreamWidth = 64L)
          .orderBy(col("source"), col("doc_id"))
      },
      Some("""WITH surv AS (
             |  SELECT doc_id, source, text FROM (
             |    SELECT doc_id, source, text,
             |           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
             |    FROM documents) WHERE rk = 1),
             |q AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(list_filter(string_split(text,' '), t -> t <> '')) AS BIGINT) AS n_tokens,
             |    CAST(len(list_distinct(list_filter(string_split(text,' '), t -> t <> ''))) AS BIGINT) AS n_uniq
             |  FROM surv),
             |kept AS (
             |  SELECT doc_id, source, n_tokens FROM q
             |  WHERE n_tokens >= 20 AND n_uniq * 3 >= n_tokens
             |    AND substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 2) <
             |        (CASE TRY_CAST(substr(source, 4) AS INT) % 4
             |           WHEN 0 THEN '40' WHEN 1 THEN '80' WHEN 2 THEN 'c0'
             |           ELSE 'zz' END)),
             |o AS (
             |  SELECT doc_id, source, n_tokens,
             |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |                             ROWS UNBOUNDED PRECEDING) - n_tokens
             |         AS BIGINT) AS start_offset
             |  FROM kept)
             |SELECT doc_id, source, n_tokens, start_offset,
             |       start_offset // 512 AS bin
             |FROM o ORDER BY source, doc_id""".stripMargin)),

    // Character-8-gram Jaccard on the LSH candidate pairs (shingle sets, not
    // token sets — robust to word-boundary edits).
    QueryDef("q_ngram_jaccard",
      (s, d) => Dedup.setJaccardOnPairs(
          setsOf("gram", gramsOf(s, d), "gram", d), pairsOf(s, d))
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $sigsWideDuckSql,
              |$bandsDuckSql,
              |grams AS (
              |  SELECT DISTINCT doc_id, substr(text, i, 8) AS gram
              |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 6, 2))) AS i
              |        FROM documents)),
              |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
              |inter AS (
              |  SELECT p.doc_a, p.doc_b, count(*) AS n_common
              |  FROM pairs p
              |  JOIN grams ga ON ga.doc_id = p.doc_a
              |  JOIN grams gb ON gb.doc_id = p.doc_b AND gb.gram = ga.gram
              |  GROUP BY p.doc_a, p.doc_b)
              |SELECT p.doc_a, p.doc_b, COALESCE(i.n_common, 0) AS n_common,
              |       sa.sz AS size_a, sb.sz AS size_b
              |FROM pairs p
              |JOIN sizes sa ON sa.doc_id = p.doc_a
              |JOIN sizes sb ON sb.doc_id = p.doc_b
              |LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
              |ORDER BY p.doc_a, p.doc_b""".stripMargin)),

    // Exact-substring chunk dedup (tiled Lee et al. 2022): 4-token tiles,
    // any tile occurring >1× corpus-wide is dropped from every doc, text
    // reassembled in order. One tile aggregation + one join back on the
    // tile — exact-dedup shuffle shape at chunk granularity.
    QueryDef("q_chunk_dedup",
      (s, d) => Dedup.chunkDedup(Dedup.tokenTiles(spreadDocs(s, d), n = 4))
        .orderBy(col("doc_id")),
      Some("""WITH tiles AS (
             |  SELECT doc_id, i AS tile_idx,
             |         array_to_string(list_slice(string_split(text, ' '), i*4 + 1, i*4 + 4), ' ') AS tile
             |  FROM (SELECT doc_id, text,
             |               unnest(range(0, ((len(string_split(text, ' ')) - 1) // 4) + 1)) AS i
             |        FROM documents)),
             |counts AS (SELECT tile, count(*) AS n_occ FROM tiles GROUP BY tile)
             |SELECT t.doc_id, count(*) AS n_tiles,
             |       CAST(sum(CASE WHEN c.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_tiles,
             |       COALESCE(string_agg(CASE WHEN c.n_occ = 1 THEN t.tile END, ' ' ORDER BY t.tile_idx), '')
             |         AS retained_text
             |FROM tiles t JOIN counts c USING (tile)
             |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin)),

    // Exact-substring SPAN dedup (Lee et al. 2022, windowed): stride-1
    // 5-token windows, every position covered by a corpus-duplicated window
    // masked out — duplicated spans removed at ANY offset, unlike the tiled
    // q_chunk_dedup. Post-filter work is sized by true duplication.
    QueryDef("q_span_dedup",
      (s, d) => Dedup.spanDedup(spreadDocs(s, d), n = 5)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |wins AS (
             |  SELECT doc_id, i AS pos, array_to_string(list_slice(tk, i + 1, i + 5), ' ') AS win
             |  FROM (SELECT doc_id, tk, unnest(range(0, greatest(len(tk) - 4, 0))) AS i FROM toks)),
             |counts AS (SELECT win, count(*) AS n_occ FROM wins GROUP BY win),
             |dup AS (SELECT w.doc_id, w.pos FROM wins w JOIN counts c USING (win) WHERE c.n_occ > 1),
             |cov AS (SELECT DISTINCT doc_id, pos + j AS cp FROM dup, unnest(range(0, 5)) AS js(j)),
             |ncov AS (SELECT doc_id, count(*) AS n_covered FROM cov GROUP BY doc_id),
             |tokpos AS (
             |  SELECT doc_id, j AS tpos, tk[j + 1] AS tok
             |  FROM toks, unnest(range(0, len(tk))) AS js(j)),
             |ret AS (
             |  SELECT tp.doc_id,
             |         COALESCE(string_agg(tp.tok, ' ' ORDER BY tp.tpos)
             |                    FILTER (WHERE cv.cp IS NULL), '') AS retained_text
             |  FROM tokpos tp
             |  LEFT JOIN cov cv ON cv.doc_id = tp.doc_id AND cv.cp = tp.tpos
             |  GROUP BY tp.doc_id)
             |SELECT t.doc_id, len(t.tk) AS n_tokens,
             |       COALESCE(n.n_covered, 0) AS n_covered, r.retained_text
             |FROM toks t
             |LEFT JOIN ncov n ON n.doc_id = t.doc_id
             |JOIN ret r ON r.doc_id = t.doc_id
             |ORDER BY t.doc_id""".stripMargin)),

    // Incremental dedup: a simulated ingest batch (doc_id % 5 = 0) banded
    // against the ALREADY-INDEXED rest of the corpus — no corpus self-join;
    // candidates verified with shingle-set Jaccard. Signatures are per-doc,
    // so both sides filter the ONE persisted signature artifact.
    QueryDef("q_dedup_incremental",
      (s, d) => {
        val sigs = sigsOf(s, d)
        val cand = Dedup.crossSetCandidates(
          sigs.where(col("doc_id") % 5 =!= 0),
          sigs.where(col("doc_id") % 5 === 0),
          bands = 2, rowsPerBand = 2)
        val sets = setsOf("gram", gramsOf(s, d), "gram", d)
        cand
          .join(sets.select(col("doc_id").as("batch_doc"), col("elems").as("eb")), "batch_doc")
          .join(sets.select(col("doc_id").as("index_doc"), col("elems").as("ei")), "index_doc")
          .select(col("batch_doc"), col("index_doc"),
            size(array_intersect(col("eb"), col("ei"))).cast("long").as("n_common"),
            size(col("eb")).cast("long").as("size_batch"),
            size(col("ei")).cast("long").as("size_index"))
          .orderBy(col("batch_doc"), col("index_doc"))
      },
      Some(s"""WITH $sigsWideDuckSql,
              |bands AS (
              |  SELECT doc_id, 0 AS band, mh0 || mh1 AS sig FROM sigs
              |  UNION ALL
              |  SELECT doc_id, 1 AS band, mh2 || mh3 AS sig FROM sigs),
              |cand AS (
              |  SELECT DISTINCT n.doc_id AS batch_doc, x.doc_id AS index_doc
              |  FROM bands n JOIN bands x ON n.band = x.band AND n.sig = x.sig
              |  WHERE n.doc_id % 5 = 0 AND x.doc_id % 5 <> 0),
              |grams AS (
              |  SELECT DISTINCT doc_id, substr(text, i, 8) AS gram
              |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 6, 2))) AS i
              |        FROM documents)),
              |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
              |inter AS (
              |  SELECT c.batch_doc, c.index_doc, count(*) AS n_common
              |  FROM cand c
              |  JOIN grams ga ON ga.doc_id = c.batch_doc
              |  JOIN grams gb ON gb.doc_id = c.index_doc AND gb.gram = ga.gram
              |  GROUP BY c.batch_doc, c.index_doc)
              |SELECT c.batch_doc, c.index_doc, COALESCE(i.n_common, 0) AS n_common,
              |       sa.sz AS size_batch, sb.sz AS size_index
              |FROM cand c
              |JOIN sizes sa ON sa.doc_id = c.batch_doc
              |JOIN sizes sb ON sb.doc_id = c.index_doc
              |LEFT JOIN inter i ON i.batch_doc = c.batch_doc AND i.index_doc = c.index_doc
              |ORDER BY c.batch_doc, c.index_doc""".stripMargin)),

    // Cross-source duplication matrix: which sources duplicate each other —
    // the verified LSH pair set joined to each side's source, rolled up to
    // an unordered (source_a ≤ source_b) matrix. The pair set is ~linear in
    // true near-dups, so both joins and the rollup are candidate-sized.
    QueryDef("q_dup_source_matrix",
      (s, d) => {
        val src = table(s, d, "documents").select(col("doc_id"), col("source"))
        pairsOf(s, d)
          .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
          .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
          .groupBy(least(col("sa"), col("sb")).as("source_a"),
            greatest(col("sa"), col("sb")).as("source_b"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some(s"""WITH $sigsWideDuckSql,
              |$bandsDuckSql
              |SELECT least(da.source, db.source) AS source_a,
              |       greatest(da.source, db.source) AS source_b,
              |       count(*) AS n_pairs
              |FROM pairs p
              |JOIN documents da ON da.doc_id = p.doc_a
              |JOIN documents db ON db.doc_id = p.doc_b
              |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin)),

    // Normalized exact dedup (the C4-style pass): same one-shuffle shape as
    // q_dedup_exact but over lowercased/punctuation-stripped/space-squashed
    // text; n_raw_variants > 1 marks groups raw-byte hashing missed.
    QueryDef("q_dedup_normalized",
      (s, d) => graft.llm.Dedup.normalizedExact(table(s, d, "documents"))
        .orderBy(col("content_hash")),
      Some("""SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
             |         '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS content_hash,
             |       min(doc_id) AS keep_id, count(*) AS n_copies,
             |       count(DISTINCT md5(text))::BIGINT AS n_raw_variants
             |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin)),

    // SemDeDup (Abbas et al. 2023): within-IVF-cell cosine pairs ≥ τ form
    // semantic duplicate groups (connected components — the cached
    // semClustersOf artifact); each group keeps its LEAST-centroid-similar
    // member (prune the redundant cluster core, keep the atypical example).
    // Spark side = min-label propagation + one broadcast centroid-similarity
    // map pass + one per-group window; oracle = the same derivation with a
    // recursive CTE. Cosines are the proven-bit-identical ordered fold, so
    // float cent_sim hash-matches exactly.
    QueryDef("q_semdedup",
      (s, d) => Dedup.semDeDupFromClusters(
          ivfOf(s, d), centroidsOf(s, d), semClustersOf(s, d))
        .orderBy(col("vec_id")),
      Some {
        // cent_sim must be Spark's EXACT ordered-fold cosine — DuckDB's
        // list_cosine_similarity clamps cos(v,v) to 1.0 where the fold
        // gives 1.0000000000000002 for the centroid vectors themselves
        // (the one case the rest of the family never outputs); for
        // distinct vectors the two agree bit-for-bit, so the assignment
        // ranking and the pair threshold keep the builtin.
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(list_zip($a, $b),
             |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p, q) -> p + q)
             |   / (sqrt(list_reduce(list_transform($a,
             |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q))
             |    * sqrt(list_reduce(list_transform($b,
             |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q))))""".stripMargin
        s"""WITH RECURSIVE cents AS (
           |  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce
           |  FROM embeddings WHERE vec_id IN (10, 20, 30, 40)),
           |scored AS (
           |  SELECT e.vec_id, e.embedding::DOUBLE[] AS emb, c.centroid_id,
           |         list_cosine_similarity(e.embedding::DOUBLE[], c.ce) AS sim
           |  FROM embeddings e CROSS JOIN cents c),
           |assigned AS (
           |  SELECT vec_id, emb, centroid_id AS cell FROM scored
           |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) = 1),
           |csim AS (
           |  SELECT a.vec_id, a.cell, a.emb, ${cos("a.emb", "c.ce")} AS cent_sim
           |  FROM assigned a JOIN cents c ON c.centroid_id = a.cell),
           |pairs AS (
           |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
           |  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
           |  WHERE list_cosine_similarity(a.emb, b.emb) >= 0.35),
           |edges AS (
           |  SELECT doc_a AS s, doc_b AS d FROM pairs
           |  UNION ALL SELECT doc_b, doc_a FROM pairs),
           |cc(doc, lbl) AS (
           |  SELECT s, s FROM edges
           |  UNION
           |  SELECT e.s, cc.lbl FROM edges e JOIN cc ON cc.doc = e.d),
           |clusters AS (
           |  SELECT doc AS vec_id, min(lbl) AS cluster_id FROM cc GROUP BY doc)
           |SELECT a.vec_id, a.cell,
           |       coalesce(c.cluster_id, a.vec_id) AS cluster_id, a.cent_sim,
           |       CAST(row_number() OVER (
           |         PARTITION BY coalesce(c.cluster_id, a.vec_id)
           |         ORDER BY a.cent_sim, a.vec_id) = 1 AS INT) AS keep
           |FROM csim a LEFT JOIN clusters c USING (vec_id)
           |ORDER BY vec_id""".stripMargin
      }),

    // Semantic decontamination: every 25th vector is the held-out eval set;
    // each remaining corpus vector takes a per-row argmax of cosine over the
    // broadcast eval array (map-only — the corpus payload never shuffles)
    // and is flagged at ≥ 0.35. The oracle mirrors the ordered-fold cosine
    // explicitly (list_cosine_similarity clamps; the fold does not).
    QueryDef("q_semantic_decontam",
      (s, d) => Dedup.semanticContamination(
          spreadEmbeddings(s, d).where(col("vec_id") % 25 =!= 0),
          spreadEmbeddings(s, d).where(col("vec_id") % 25 === 0),
          threshold = 0.35)
        .orderBy(col("vec_id")),
      Some {
        def cos(a: String, b: String) =
          s"""(list_reduce(list_transform(list_zip($a, $b),
             |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p, q) -> p + q)
             |   / (sqrt(list_reduce(list_transform($a,
             |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q))
             |    * sqrt(list_reduce(list_transform($b,
             |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q))))""".stripMargin
        s"""WITH ev AS (
           |  SELECT vec_id AS hid, embedding::DOUBLE[] AS he
           |  FROM embeddings WHERE vec_id % 25 = 0),
           |co AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS ce
           |  FROM embeddings WHERE vec_id % 25 <> 0),
           |scored AS (
           |  SELECT co.vec_id, ev.hid, ${cos("co.ce", "ev.he")} AS s
           |  FROM co CROSS JOIN ev)
           |SELECT vec_id, s AS max_sim, hid AS nearest_eval_id,
           |       CAST(s >= 0.35 AS INT) AS contaminated
           |FROM scored
           |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, hid) = 1
           |ORDER BY vec_id""".stripMargin
      }),

    // Incremental SemDeDup: every 5th vector is the ingest batch, the rest
    // are the indexed corpus; candidates share a coarse cell and pass the
    // cosine cut — batch×index only, never an index self-join (the
    // embedding-space twin of q_dedup_incremental's maintenance shape).
    QueryDef("q_semdedup_incremental",
      (s, d) => Dedup.incrementalSemanticPairs(
          ivfOf(s, d).where(col("vec_id") % 5 =!= 0),
          ivfOf(s, d).where(col("vec_id") % 5 === 0),
          threshold = 0.35)
        .orderBy(col("batch_id"), col("index_id")),
      Some("""WITH cents AS (
             |  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS ce
             |  FROM embeddings WHERE vec_id IN (10, 20, 30, 40)),
             |scored AS (
             |  SELECT e.vec_id, e.embedding::DOUBLE[] AS emb, c.centroid_id,
             |         list_cosine_similarity(e.embedding::DOUBLE[], c.ce) AS sim
             |  FROM embeddings e CROSS JOIN cents c),
             |assigned AS (
             |  SELECT vec_id, emb, centroid_id AS cell FROM scored
             |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) = 1)
             |SELECT b.vec_id AS batch_id, i.vec_id AS index_id,
             |       list_cosine_similarity(b.emb, i.emb) AS cos_sim
             |FROM assigned b JOIN assigned i ON b.cell = i.cell
             |WHERE b.vec_id % 5 = 0 AND i.vec_id % 5 <> 0
             |  AND list_cosine_similarity(b.emb, i.emb) >= 0.35
             |ORDER BY batch_id, index_id""".stripMargin))
  )
}
