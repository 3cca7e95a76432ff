package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Dedup, IntervalJoin}
import org.apache.spark.sql.functions._

/** Round-37 batch: peak session concurrency (sweep line) and the
  * normalization-sensitive dedup audit.
  */
object Round37Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Max simultaneous 30-min sessions per event type.
    QueryDef("q_peak_concurrency",
      (s, d) => IntervalJoin.peakConcurrency(
        Tables.events(s, d)
          .withColumn("t_s", expr("unix_micros(ts) div 1000000"))
          .select(col("event_type").as("k"), col("t_s").as("s0"),
            (col("t_s") + 1800L).as("e0")),
        "k", "s0", "e0"),
      Some("""WITH iv AS (
             |  SELECT event_type AS key,
             |         epoch_us(ts) // 1000000 AS s,
             |         epoch_us(ts) // 1000000 + 1800 AS e
             |  FROM events),
             |ev AS (
             |  SELECT key, s AS t, 1 AS delta FROM iv
             |  UNION ALL
             |  SELECT key, e AS t, -1 AS delta FROM iv),
             |run AS (
             |  SELECT key,
             |         sum(delta) OVER (PARTITION BY key ORDER BY t, delta
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |           AS c
             |  FROM ev)
             |SELECT key, CAST(count(*) / 2 AS BIGINT) AS n_intervals,
             |       CAST(max(c) AS BIGINT) AS peak
             |FROM run GROUP BY key""".stripMargin)),

    // ── How much duplicate mass is formatting-only?
    QueryDef("q_dedup_normalized",
      (s, d) => Dedup.normalizedStats(
        Tables.documents(s, d).select(col("doc_id"), col("text"))),
      Some("""WITH g AS (
             |  SELECT md5(regexp_replace(lower(text), '[^a-z0-9 ]', '',
             |               'g')) AS norm_md5,
             |         CAST(count(*) AS BIGINT) AS n,
             |         CAST(count(DISTINCT md5(text)) AS BIGINT)
             |           AS raw_variants
             |  FROM documents GROUP BY 1)
             |SELECT CAST(sum(n) AS BIGINT) AS n_docs,
             |       CAST(count(*) AS BIGINT) AS n_groups,
             |       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_dup_groups,
             |       CAST(sum(CASE WHEN n > 1 AND raw_variants = n
             |                THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_format_only_groups,
             |       CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
             |         AS docs_in_dup_groups
             |FROM g""".stripMargin))
  )
}
