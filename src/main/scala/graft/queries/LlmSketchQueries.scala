package graft.queries

import graft.llm.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import QueryDef.table
import LlmArtifacts._

/** Mergeable sketch family: HyperLogLog distinct counts, Count-Min frequency estimates, and DDSketch-style quantile bounds as engine-portable register artifacts.
  * Split out of the former monolithic LlmQueries registry; shared index
  * artifacts live in [[LlmArtifacts]]. See that object for the scale notes
  * common to the family. */
private[queries] object LlmSketchQueries {

  val defs: Seq[QueryDef] = Seq(

    // Count-Min sketch (Cormode & Muthukrishnan 2005): per-source
    // frequency estimates for the corpus's 5 globally-heaviest tokens,
    // alongside exact counts — the estimate never under-counts (the CMS
    // guarantee, visible in the result). All integers; registers are one
    // map-side-combined (source, row, col) aggregate ≤ 256 rows/source.
    QueryDef("q_cms_counts",
      (s, d) => {
        // vacuously-true not-nulls stated EXPLICITLY (the bigramSurprisal
        // discipline): the probe/exact joins infer isnotnull on their keys
        // and would push DIFFERENT filters into each branch's copy of the
        // subtree below, breaking canonical equality — and with it the
        // shared exchange that makes the corpus tokenize run once
        val toks = table(s, d, "documents").select(col("source"),
          explode(filter(split(col("text"), " "), t => t =!= "")).as("token"))
          .where(col("source").isNotNull && col("token").isNotNull)
        // ONE corpus tokenize: registers, the probe top-5 and the exact
        // counts all derive from this (source, token) count frame — the
        // three consumers share its Exchange (ReusedExchange) instead of
        // each re-exploding the corpus (guide §2.3 aggregate-before-
        // shuffle / §2.4 shared exchanges; was 3 scans+Generates).
        val base = toks.groupBy(col("source"), col("token"))
          .agg(count(lit(1)).as("cnt"))
        val regs = graft.llm.Sketches.cmsRegistersWeighted(
          base, Seq("source"), "token", "cnt")
        val probeToks = base.groupBy(col("token"))
          .agg(sum(col("cnt")).as("n_global"))
          .orderBy(col("n_global").desc, col("token")).limit(5)
          .select("token")
        val pairs = table(s, d, "documents").select(col("source")).distinct()
          .crossJoin(broadcast(probeToks))
        val exact = base.join(broadcast(probeToks), "token")
          .select(col("source"), col("token"), col("cnt").as("n_exact"))
        graft.llm.Sketches.cmsEstimate(regs, pairs, Seq("source"), "token")
          .join(exact, Seq("source", "token"), "left_outer")
          .select(col("source"), col("token"), col("cms_est"),
            coalesce(col("n_exact"), lit(0L)).as("n_exact"))
          .orderBy(col("source"), col("token"))
      },
      Some("""WITH toks AS (
             |  SELECT source, token
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
             |        FROM documents)
             |  WHERE token <> ''),
             |regs AS (
             |  SELECT source, r, ('0x' || substr(md5(token), r * 8 + 1, 8))::BIGINT % 64 AS c,
             |         count(*)::BIGINT AS cnt
             |  FROM toks, unnest(range(0, 4)) AS rs(r)
             |  GROUP BY 1, 2, 3),
             |probes AS (
             |  SELECT token FROM (
             |    SELECT token, count(*) AS n FROM toks GROUP BY 1
             |    ORDER BY n DESC, token LIMIT 5)),
             |pairs AS (
             |  SELECT source, token
             |  FROM (SELECT DISTINCT source FROM documents), probes),
             |pb AS (
             |  SELECT source, token, r,
             |         ('0x' || substr(md5(token), r * 8 + 1, 8))::BIGINT % 64 AS c
             |  FROM pairs, unnest(range(0, 4)) AS rs(r)),
             |est AS (
             |  SELECT source, token, min(coalesce(cnt, 0))::BIGINT AS cms_est
             |  FROM pb LEFT JOIN regs USING (source, r, c)
             |  GROUP BY 1, 2),
             |exact AS (
             |  SELECT source, token, count(*)::BIGINT AS n_exact
             |  FROM toks JOIN probes USING (token)
             |  GROUP BY 1, 2)
             |SELECT e.source, e.token, e.cms_est,
             |       coalesce(x.n_exact, 0)::BIGINT AS n_exact
             |FROM est e LEFT JOIN exact x USING (source, token)
             |ORDER BY e.source, e.token""".stripMargin)),

    // Engine-portable HyperLogLog (Flajolet et al. 2007): per-source
    // distinct-token cardinality from an md5-register sketch, alongside
    // the exact count so the estimate's error is visible in the result.
    // Registers are ONE map-side-combined (source, bucket) aggregate —
    // ≤ 256 rows per source survive regardless of corpus size; the
    // estimate is an ordered register fold, bit-identical in any engine.
    QueryDef("q_hll_distinct",
      (s, d) => {
        // explicit vacuous not-nulls: the est⋈exact join infers them per
        // branch and would otherwise fork the shared subtree (see q_cms)
        val toks = table(s, d, "documents").select(col("source"),
          explode(filter(split(col("text"), " "), t => t =!= "")).as("token"))
          .where(col("source").isNotNull && col("token").isNotNull)
        // ONE corpus tokenize: registers AND the exact distinct count both
        // derive from the per-(source, token) coordinate frame and share
        // its Exchange (was 2 scans+Generates; a bare distinct() gets
        // stripped by RemoveRedundantAggregates under the registers' max —
        // the coords frame's real aggregate buffer is what both consumers
        // need, so the copies stay canonically identical).
        val coords = graft.llm.Sketches.hllValueCoords(
          toks, Seq("source"), "token", p = 8)
        val est = graft.llm.Sketches.hllEstimate(
          graft.llm.Sketches.hllRegistersFromCoords(coords, Seq("source")),
          Seq("source"), p = 8)
        est.join(coords.groupBy("source")
            .agg(count(col("m_rho")).as("n_exact")), "source")
          .orderBy(col("source"))
      },
      Some("""WITH toks AS (
             |  SELECT source, token
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
             |        FROM documents)
             |  WHERE token <> ''),
             |hashed AS (
             |  SELECT source, ('0x' || substr(md5(token), 1, 2))::INT AS bucket,
             |         ('0x' || substr(md5(token), 3, 13))::BIGINT AS suffix
             |  FROM toks),
             |regs AS (
             |  SELECT source, bucket,
             |         max(CASE WHEN suffix = 0 THEN 53
             |                  ELSE 53 - length(bin(suffix)) END)::INT AS m_rho
             |  FROM hashed GROUP BY 1, 2),
             |est AS (
             |  SELECT source, count(*)::BIGINT AS buckets_hit,
             |         list_reduce(list_prepend(0.0,
             |             list(pow(2.0, -m_rho) ORDER BY bucket)),
             |           (a, b) -> a + b) AS s
             |  FROM regs GROUP BY source)
             |SELECT source, buckets_hit,
             |       (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
             |         / ((256.0 - buckets_hit) + s) AS hll_est,
             |       n_exact
             |FROM est
             |JOIN (SELECT source, count(DISTINCT token)::BIGINT AS n_exact
             |      FROM toks GROUP BY source) USING (source)
             |ORDER BY source""".stripMargin)),

    // Heavy hitters without re-reading the corpus (Cormode &
    // Hadjieleftheriou 2008's counter+sketch hybrid over disjoint shards):
    // per-shard exact φ-frequent tokens union to a candidate set that
    // provably misses no global φ-heavy hitter (pigeonhole over shards);
    // the merged CMS then decides from REGISTERS ALONE (n read off row 0,
    // estimates never under-count — no true hitter dropped). n_exact rides
    // along so both one-sided guarantees are visible per row.
    QueryDef("q_heavy_hitters",
      (s, d) => {
        val phi = 0.04
        // explicit vacuous not-nulls: the hh semi/inner joins infer them
        // per branch and would otherwise fork the shared subtree (q_cms)
        val toks = table(s, d, "documents").select(col("source"),
          (col("doc_id") % 4).as("shard"),
          explode(filter(split(col("text"), " "), t => t =!= "")).as("token"))
          .where(col("source").isNotNull && col("token").isNotNull)
        // ONE corpus tokenize: candidates, registers and the exact verify
        // all derive from this (source, shard, token) count frame — the
        // three consumers share its Exchange (was 3 scans+Generates; CMS
        // registers from summed weights are byte-identical, the linear-
        // sketch property).
        val grp = toks.groupBy(col("source"), col("shard"), col("token"))
          .agg(count(lit(1)).as("_cnt"))
        val cand = graft.llm.Sketches.frequentCandidatesFromCounts(
          grp, Seq("source"), "token", "shard", "_cnt", phi)
        val regs = graft.llm.Sketches.cmsRegistersWeighted(
          grp, Seq("source"), "token", "_cnt")
        val hh = graft.llm.Sketches.cmsHeavyHitters(
          regs, cand, Seq("source"), "token", phi)
        val exact = grp
          .join(broadcast(hh.select("source", "token")), Seq("source", "token"), "left_semi")
          .groupBy(col("source"), col("token"))
          .agg(sum(col("_cnt")).as("n_exact"))
        hh.join(exact, Seq("source", "token"))
          .select(col("source"), col("token"), col("cms_est"),
            col("n_total"), col("n_exact"))
          .orderBy(col("source"), col("token"))
      },
      Some("""WITH toks AS (
             |  SELECT source, doc_id % 4 AS shard, token
             |  FROM (SELECT source, doc_id, unnest(string_split(text, ' ')) AS token
             |        FROM documents)
             |  WHERE token <> ''),
             |grp AS (
             |  SELECT source, shard, token, count(*)::BIGINT AS cnt
             |  FROM toks GROUP BY 1, 2, 3),
             |cand AS (
             |  SELECT DISTINCT source, token
             |  FROM (SELECT source, shard, token, cnt,
             |          sum(cnt) OVER (PARTITION BY source, shard) AS tot FROM grp)
             |  WHERE cnt::HUGEINT * 1000000000 >= tot::HUGEINT * 40000000),
             |regs AS (
             |  SELECT source, r, ('0x' || substr(md5(token), r * 8 + 1, 8))::BIGINT % 64 AS c,
             |         count(*)::BIGINT AS cnt
             |  FROM toks, unnest(range(0, 4)) AS rs(r)
             |  GROUP BY 1, 2, 3),
             |n AS (SELECT source, sum(cnt)::BIGINT AS n_total FROM regs WHERE r = 0 GROUP BY 1),
             |pb AS (
             |  SELECT source, token, r,
             |         ('0x' || substr(md5(token), r * 8 + 1, 8))::BIGINT % 64 AS c
             |  FROM cand, unnest(range(0, 4)) AS rs(r)),
             |est AS (
             |  SELECT source, token, min(coalesce(cnt, 0))::BIGINT AS cms_est
             |  FROM pb LEFT JOIN regs USING (source, r, c)
             |  GROUP BY 1, 2),
             |hh AS (
             |  SELECT e.source, e.token, e.cms_est, n.n_total
             |  FROM est e JOIN n USING (source)
             |  WHERE e.cms_est::HUGEINT * 1000000000 >= n.n_total::HUGEINT * 40000000),
             |exact AS (
             |  SELECT source, token, count(*)::BIGINT AS n_exact
             |  FROM toks JOIN hh USING (source, token)
             |  GROUP BY 1, 2)
             |SELECT h.source, h.token, h.cms_est, h.n_total, x.n_exact
             |FROM hh h JOIN exact x USING (source, token)
             |ORDER BY h.source, h.token""".stripMargin)),

    // Bloom membership filter (Bloom 1970) as a sparse register artifact:
    // per-source filter built from the EVEN-doc half of the corpus, probed
    // with every corpus token plus 20 guaranteed-absent literals.
    // truly_present rides along so the one-sided guarantee is visible per
    // row: maybe_present is true for EVERY truly-present token (no false
    // negatives, the filter's contract), false for absent ones except
    // k-fold bit collisions. All-md5 integer bit math — cross-engine exact.
    QueryDef("q_bloom_filter",
      (s, d) => {
        val (k, m) = (4, 4096)
        // explicit vacuous not-nulls: the truly_present join infers them
        // per branch and would otherwise fork the shared subtree (q_cms)
        val toks = table(s, d, "documents").select(col("source"), col("doc_id"),
          explode(filter(split(col("text"), " "), t => t =!= "")).as("token"))
          .where(col("source").isNotNull && col("token").isNotNull)
        // ONE corpus tokenize: the build set, the probe set and the
        // truly_present join all derive from this per-(source, token)
        // even-doc-membership aggregate and share its Exchange (was 3
        // scans+Generates). `max` over booleans = "appears in any even
        // doc", so build is exactly the old filtered distinct.
        val td = toks.groupBy(col("source"), col("token"))
          .agg(max(col("doc_id") % 2 === 0).as("_has_even"))
        val build = td.where(col("_has_even")).select("source", "token")
        val regs = graft.llm.Sketches.bloomRegisters(build, Seq("source"), "token", k, m)
        val probes = td.select("source", "token")
          .unionByName(table(s, d, "documents").select(col("source")).distinct()
            .select(col("source"), explode(array((0 until 20).map(i =>
              lit(s"absent_$i")): _*)).as("token")))
        graft.llm.Sketches.bloomContains(regs, probes, Seq("source"), "token", k, m)
          .join(build.withColumn("truly_present", lit(true)),
            Seq("source", "token"), "left_outer")
          .select(col("source"), col("token"), col("maybe_present"),
            coalesce(col("truly_present"), lit(false)).as("truly_present"))
          .orderBy(col("source"), col("token"))
      },
      Some("""WITH toks AS (
             |  SELECT source, doc_id, token
             |  FROM (SELECT source, doc_id, unnest(string_split(text, ' ')) AS token
             |        FROM documents)
             |  WHERE token <> ''),
             |build AS (
             |  SELECT DISTINCT source, token FROM toks WHERE doc_id % 2 = 0),
             |regs AS (
             |  SELECT DISTINCT source,
             |         ('0x' || substr(md5(token), r * 8 + 1, 8))::BIGINT % 4096 AS bit
             |  FROM build, unnest(range(0, 4)) AS rs(r)),
             |probes AS (
             |  SELECT DISTINCT source, token FROM toks
             |  UNION
             |  SELECT DISTINCT source, 'absent_' || i::VARCHAR AS token
             |  FROM toks, unnest(range(0, 20)) AS t(i)),
             |pb AS (
             |  SELECT source, token, r,
             |         ('0x' || substr(md5(token), r * 8 + 1, 8))::BIGINT % 4096 AS bit
             |  FROM probes, unnest(range(0, 4)) AS rs(r)),
             |hit AS (
             |  SELECT pb.source, pb.token, sum(coalesce(s.s, 0))::BIGINT AS nbits
             |  FROM pb LEFT JOIN (SELECT source, bit, 1 AS s FROM regs) s
             |    USING (source, bit)
             |  GROUP BY 1, 2)
             |SELECT h.source, h.token, h.nbits = 4 AS maybe_present,
             |       (b.token IS NOT NULL) AS truly_present
             |FROM hit h LEFT JOIN build b USING (source, token)
             |ORDER BY h.source, h.token""".stripMargin)),

    // DDSketch-style quantile sketch (Masson et al. 2019), integer-exact
    // bitlen/linear-sub-bucket variant: per-source doc-length quantile
    // BOUNDS [q_lo, q_hi) from the mergeable register artifact, alongside
    // the exact rank quantile — lo ≤ exact < hi is the sketch's relative-
    // error guarantee, visible in every output row. Registers are one
    // map-side-combined (source, qb, sub) aggregate, ≤ 64·s rows/source.
    QueryDef("q_quantile_sketch",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val qs = Seq(0.5, 0.9, 0.99)
        val lens = table(s, d, "documents")
          .select(col("source"), length(col("text")).cast("long").as("v"))
        val est = graft.llm.Sketches.quantileEstimate(
          graft.llm.Sketches.quantileRegisters(lens, Seq("source"), "v"),
          Seq("source"), qs)
        // exact side via the lengthQuantiles distinct-value-counts
        // discipline (TextAnalysis.scala lengthQuantiles): fold (source, v)
        // counts map-side, run the cumulative window over DISTINCT lengths
        // per source — the value at rank ceil(q·n) is the least v whose
        // cumulative count reaches it, identical to row_number() picking
        // through duplicates, and nothing rank-shaped touches payload rows
        // (the previous form ranked the full documents table in one task
        // per source — the exact pattern the library purged).
        val bySource = Window.partitionBy(col("source"))
        val cum = lens.groupBy(col("source"), col("v"))
          .agg(count(lit(1)).as("_c"))
          .withColumn("_cum", sum(col("_c")).over(
            bySource.orderBy(col("v"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("nn", sum(col("_c")).over(bySource))
        val picks = qs.map(q =>
          min(when(col("_cum") >= ceil(col("nn") * q), col("v")))
            .as(s"_e${(q * 100).round}"))
        val exactWide = cum.groupBy(col("source")).agg(picks.head, picks.tail: _*)
        val exact = qs.map(q => exactWide.select(col("source"),
            lit(q).as("q"), col(s"_e${(q * 100).round}").as("exact_v")))
          .reduce(_ unionByName _)
        est.join(exact, Seq("source", "q"))
          .orderBy(col("source"), col("q"))
      },
      Some("""WITH lens AS (
             |  SELECT source, CAST(length(text) AS BIGINT) AS v FROM documents),
             |regs AS (
             |  SELECT source, qb, sub, count(*)::BIGINT AS cnt FROM (
             |    SELECT source,
             |      CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS qb,
             |      CASE WHEN v = 0 THEN 0
             |           ELSE ((v - CAST(pow(2.0, length(bin(v)) - 1) AS BIGINT)) * 16)
             |                // CAST(pow(2.0, length(bin(v)) - 1) AS BIGINT) END AS sub
             |    FROM lens)
             |  GROUP BY 1, 2, 3),
             |cum AS (
             |  SELECT source, qb, sub, cnt,
             |    (sum(cnt) OVER (PARTITION BY source ORDER BY qb, sub))::BIGINT AS cum,
             |    (sum(cnt) OVER (PARTITION BY source))::BIGINT AS n,
             |    CASE WHEN qb = 0 THEN 0 ELSE CAST(pow(2.0, qb - 1) AS BIGINT)
             |         + sub * CAST(pow(2.0, qb - 1) AS BIGINT) // 16 END AS q_lo,
             |    CASE WHEN qb = 0 THEN 1 ELSE CAST(pow(2.0, qb - 1) AS BIGINT)
             |         + ((sub + 1) * CAST(pow(2.0, qb - 1) AS BIGINT) + 15) // 16 END AS q_hi
             |  FROM regs),
             |est AS (
             |  SELECT source, q, n, q_lo, q_hi
             |  FROM cum, unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS qs(q)
             |  WHERE cum >= ceil(n * q) AND cum - cnt < ceil(n * q)),
             |ranked AS (
             |  SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY v) AS rn,
             |         count(*) OVER (PARTITION BY source) AS nn FROM lens),
             |exact AS (
             |  SELECT source, q, v AS exact_v
             |  FROM ranked, unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS qs(q)
             |  WHERE rn = ceil(nn * q))
             |SELECT e.source, e.q, e.n, e.q_lo, e.q_hi, x.exact_v
             |FROM est e JOIN exact x USING (source, q)
             |ORDER BY source, q""".stripMargin))
  )
}
