package graft.queries

import graft.llm.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import QueryDef.table
import LlmArtifacts._

/** Mergeable sketch family: HyperLogLog distinct counts and Count-Min frequency estimates as engine-portable register artifacts.
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
        val toks = table(s, d, "documents").select(col("source"),
          explode(filter(split(col("text"), " "), t => t =!= "")).as("token"))
        val regs = graft.llm.Sketches.cmsRegisters(toks, Seq("source"), "token")
        val probeToks = toks.groupBy(col("token"))
          .agg(count(lit(1)).as("n_global"))
          .orderBy(col("n_global").desc, col("token")).limit(5)
          .select("token")
        val pairs = table(s, d, "documents").select(col("source")).distinct()
          .crossJoin(broadcast(probeToks))
        val exact = toks.join(broadcast(probeToks), "token")
          .groupBy(col("source"), col("token"))
          .agg(count(lit(1)).as("n_exact"))
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
        val toks = table(s, d, "documents").select(col("source"),
          explode(filter(split(col("text"), " "), t => t =!= "")).as("token"))
        val est = graft.llm.Sketches.hllEstimate(
          graft.llm.Sketches.hllRegisters(toks, Seq("source"), "token", p = 8),
          Seq("source"), p = 8)
        est.join(toks.groupBy("source")
            .agg(countDistinct(col("token")).as("n_exact")), "source")
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
             |ORDER BY source""".stripMargin))
  )
}
