package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-73 batch, storage/ingest plumbing: block-level payload dedup
  * (fixed 64-byte blocks, content-hash distinct ratio — the storage-
  * dedup reading next to q_dedup_exact's document grain), a tombstone
  * GC planner (which CDC deletes are safely collectible past the
  * watermark — the vacuum step after q_cdc_replay), and idempotent
  * ingest (producer/sequence first-wins dedup of a replayed stream —
  * the exactly-once batch twin of the streaming upsert path).
  */
object Round73Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Block dedup: 64-byte payload blocks, hash-distinct per source.
    QueryDef("q_block_dedup",
      (s, d) => {
        val blocks = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            explode(expr(
              "transform(sequence(0, (length(text) - 1) div 64), " +
                "i -> substring(text, i * 64 + 1, 64))")).as("block"))
          .withColumn("h", Dedup.hash48(col("block"), lit("blk")))
        blocks.groupBy(col("source"))
          .agg(count(lit(1)).as("total_blocks"),
            countDistinct(col("h")).as("distinct_blocks"))
          .withColumn("dedup_ratio_e6",
            expr("distinct_blocks * 1000000 div total_blocks"))
      },
      Some {
        val h = PortableSql.hash48("block", "'blk'")
        s"""WITH blocks AS (
           |  SELECT source, doc_id,
           |         unnest(list_transform(
           |           generate_series(0, (length(text) - 1) // 64),
           |           i -> substr(text, i * 64 + 1, 64))) AS block
           |  FROM documents),
           |hashed AS (SELECT source, $h AS h FROM blocks)
           |SELECT source, CAST(count(*) AS BIGINT) AS total_blocks,
           |       CAST(count(DISTINCT h) AS BIGINT) AS distinct_blocks,
           |       CAST(count(DISTINCT h) AS BIGINT) * 1000000 // count(*)
           |         AS dedup_ratio_e6
           |FROM hashed GROUP BY 1""".stripMargin
      }),

    // ── Tombstone GC: a delete is collectible iff it is its key's LAST
    //    op AND older than the global watermark (max ts − 7 days).
    QueryDef("q_tombstone_gc",
      (s, d) => {
        val log = Tables.events(s, d).select(
          (col("user_id") % 200).as("k"),
          expr("unix_micros(ts)").as("t"), col("event_id").as("eid"),
          when(col("event_id") % 10 === 0, "D").otherwise("U").as("op"))
        val wm = log.agg((max(col("t")) - 7L * 86400000000L).as("wm"))
        log
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("k"))
              .orderBy(col("t").desc, col("eid").desc)))
          .where(col("rn") === 1 && col("op") === "D")
          .crossJoin(broadcast(wm))
          .groupBy()
          .agg(count(lit(1)).as("n_tombstones"),
            sum(when(col("t") < col("wm"), 1L).otherwise(0L))
              .as("n_collectible"),
            min(col("t")).as("oldest_t_us"), max(col("wm")).as("wm_us"))
      },
      Some("""WITH log AS (
             |  SELECT user_id % 200 AS k, epoch_us(ts) AS t,
             |         event_id AS eid,
             |         CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END
             |           AS op
             |  FROM events),
             |wm AS (SELECT max(t) - 604800000000 AS wm FROM log),
             |last AS (SELECT * FROM (
             |           SELECT *, row_number() OVER (PARTITION BY k
             |             ORDER BY t DESC, eid DESC) AS rn FROM log)
             |         WHERE rn = 1 AND op = 'D')
             |SELECT CAST(count(*) AS BIGINT) AS n_tombstones,
             |       CAST(sum(CASE WHEN t < wm THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_collectible,
             |       CAST(min(t) AS BIGINT) AS oldest_t_us,
             |       CAST(max(wm) AS BIGINT) AS wm_us
             |FROM last CROSS JOIN wm""".stripMargin)),

    // ── Idempotent ingest: replay every 13th event, dedup on
    //    (producer, sequence) keeping the FIRST arrival; report the
    //    drop count per producer.
    QueryDef("q_idempotent_ingest",
      (s, d) => {
        val base = Tables.events(s, d).select(
          (col("user_id") % 3).as("producer"), col("event_id").as("seq"),
          expr("unix_micros(ts)").as("t"), lit(0L).as("replay"))
        val replayed = base.where(col("seq") % 13 === 0)
          .withColumn("replay", lit(1L))
        val all = base.unionByName(replayed)
        all
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("producer"), col("seq"))
              .orderBy(col("replay"), col("t"))))
          .groupBy(col("producer"))
          .agg(count(lit(1)).as("n_arrivals"),
            sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_accepted"),
            sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dropped"))
          .withColumn("dup_rate_e6",
            expr("n_dropped * 1000000 div n_arrivals"))
      },
      Some("""WITH base AS (
             |  SELECT user_id % 3 AS producer, event_id AS seq,
             |         epoch_us(ts) AS t, 0 AS replay
             |  FROM events),
             |allv AS (
             |  SELECT * FROM base
             |  UNION ALL
             |  SELECT producer, seq, t, 1 FROM base WHERE seq % 13 = 0),
             |r AS (SELECT producer,
             |             row_number() OVER (PARTITION BY producer, seq
             |               ORDER BY replay, t) AS rn
             |      FROM allv)
             |SELECT producer, CAST(count(*) AS BIGINT) AS n_arrivals,
             |       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_accepted,
             |       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_dropped,
             |       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |         * 1000000 // count(*) AS dup_rate_e6
             |FROM r GROUP BY 1""".stripMargin))
  )
}
