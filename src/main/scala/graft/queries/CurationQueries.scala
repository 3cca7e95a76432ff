package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.Curation

/** Dataset-curation queries (LLM training-data pipeline): deterministic
  * splits, token-budget sequence packing, benchmark decontamination —
  * plus time-series regularization (resample + gap fill). */
object CurationQueries {

  def defs: Seq[QueryDef] = Seq(

    // ── Resample events to a dense 5-min grid per user-group with
    //    forward-filled averages ([[graft.ops.TimeSeries]]).
    QueryDef("q_resample_fill",
      (s, d) => {
        val ev = Tables.events(s, d).withColumn("grp", col("user_id") % 3)
        graft.ops.TimeSeries.fillGaps(
          graft.ops.TimeSeries.resample(ev, "grp", "ts", "value", 300L), "grp", 300L)
      },
      Some("""WITH r AS (SELECT user_id % 3 AS grp,
             |                  (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket_es,
             |                  count(*) AS cnt,
             |                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) * 100
             |                       // count(*) AS BIGINT) AS avg_e4
             |           FROM events GROUP BY 1, 2),
             |span AS (SELECT grp, min(bucket_es) AS b0, max(bucket_es) AS b1 FROM r GROUP BY 1),
             |spine AS (SELECT grp, unnest(range(b0, b1 + 300, 300)) AS bucket_es FROM span),
             |j AS (SELECT s.grp, s.bucket_es, coalesce(r.cnt, 0) AS cnt, r.avg_e4
             |      FROM spine s LEFT JOIN r USING (grp, bucket_es))
             |SELECT grp, bucket_es, cnt,
             |       last_value(avg_e4 IGNORE NULLS) OVER (PARTITION BY grp ORDER BY bucket_es
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_filled_e4
             |FROM j""".stripMargin)),

    // ── Deterministic train/val/test split (90/5/5 by id hash), observed
    //    via per-split doc/token totals.
    QueryDef("q_split_assign",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .groupBy(Curation.splitAssign(col("doc_id").cast("string")).as("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens")),
      Some {
        val h = PortableSql.hash48("CAST(doc_id AS VARCHAR)", "'split'")
        s"""SELECT CASE WHEN $h % 100 < 90 THEN 'train'
           |            WHEN $h % 100 < 95 THEN 'val'
           |            ELSE 'test' END AS split,
           |       count(*) AS n_docs,
           |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
           |FROM documents GROUP BY 1""".stripMargin
      }),

    // ── Greedy per-shard sequence packing into 512-token bins; observed
    //    as per-(shard,bin) doc counts and token sums.
    QueryDef("q_pack_sequences",
      (s, d) => Curation.packSequences(
          Tables.documents(s, d).select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", 512, 8)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens")),
      Some("""WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
             |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |           FROM documents),
             |r AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_tokens
             |      FROM t)
             |SELECT shard, CAST((run_tokens - n_tokens) // 512 AS BIGINT) AS bin,
             |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
             |FROM r GROUP BY 1, 2""".stripMargin)),

    // ── Benchmark decontamination: distinct 3-shingle overlap between the
    //    corpus (doc_id ≥ 5) and the eval holdout (doc_id < 5).
    QueryDef("q_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        Curation.contamination(docs.filter(col("doc_id") >= 5),
            docs.filter(col("doc_id") < 5))
          .select(col("doc_id"), col("n_shared"),
            (col("n_shared") >= 10).cast("int").as("contaminated"))
      },
      Some("""WITH sh AS (SELECT doc_id,
             |                   unnest(list_transform(range(1, len(ws) - 1),
             |                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
             |            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) w
             |            WHERE len(ws) >= 3),
             |cs AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE doc_id >= 5),
             |bs AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 5)
             |SELECT doc_id, count(*) AS n_shared,
             |       CAST(CASE WHEN count(*) >= 10 THEN 1 ELSE 0 END AS INTEGER) AS contaminated
             |FROM cs JOIN bs USING (shingle)
             |GROUP BY doc_id""".stripMargin))
  )
}
