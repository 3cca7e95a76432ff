package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Behavior, Bm25, ClusterEval, FuzzyJoin}
import org.apache.spark.sql.functions._

/** Round-53 batch: Fellegi–Sunter record-linkage weights (the
  * probabilistic-ER decision table over blocked candidates — the
  * scoring layer q_fuzzy_match / q_sorted_neighborhood feed), RLE
  * sequence compressibility (habit strength as a compression ratio,
  * closing the q_path_drift / q_entropy_rate sequence family), and the
  * inter-centroid distance matrix (which embedding classes sit
  * dangerously close — the geometry behind q_silhouette).
  */
object Round53Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── FS weights: clean customers vs a deterministically-perturbed
    //    copy (every-7th name, every-13th segment, every-11th balance),
    //    blocked on (nation, shifted-balance bucket). Truth = same key.
    QueryDef("q_fellegi_sunter",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey").as("ck"),
          col("c_name").as("nm"), col("c_mktsegment").as("sg"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bc"),
          col("c_nationkey").as("nk"))
        val clean = c.withColumn("blk", expr("(bc + 100000) div 100000"))
        val dirty = c.select(col("ck").as("ck2"),
            when(col("ck") % 7 === 0, concat(col("nm"), lit("X")))
              .otherwise(col("nm")).as("nm2"),
            when(col("ck") % 13 === 0, lit("PERTURBED"))
              .otherwise(col("sg")).as("sg2"),
            when(col("ck") % 11 === 0, col("bc") + 100L)
              .otherwise(col("bc")).as("bc2"),
            col("nk").as("nk2"))
          .withColumn("blk2", expr("(bc2 + 100000) div 100000"))
        val pairs = clean.join(dirty,
            col("nk") === col("nk2") && col("blk") === col("blk2"))
          .select((col("nm") === col("nm2")).as("f1"),
            (col("sg") === col("sg2")).as("f2"),
            (col("bc") === col("bc2")).as("f3"),
            (col("ck") === col("ck2")).as("is_match"))
        FuzzyJoin.fellegiSunter(pairs)
      },
      Some {
        def lg(x: String, y: String) =
          Bm25.log2E6Sql(s"greatest($x, 1)") + " - " +
            Bm25.log2E6Sql(s"greatest($y, 1)")
        def term(k: Int) =
          s"""CASE WHEN f$k THEN ${lg(s"(a$k * u)", s"(b$k * m)")}
             |     ELSE ${lg(s"((m - a$k) * u)", s"((u - b$k) * m)")} END""".stripMargin
        s"""WITH c AS (SELECT c_custkey AS ck, c_name AS nm, c_mktsegment AS sg,
           |                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bc,
           |                 c_nationkey AS nk
           |          FROM customer),
           |clean AS (SELECT *, (bc + 100000) // 100000 AS blk FROM c),
           |dirty AS (SELECT ck AS ck2,
           |                 CASE WHEN ck % 7 = 0 THEN nm || 'X' ELSE nm END AS nm2,
           |                 CASE WHEN ck % 13 = 0 THEN 'PERTURBED' ELSE sg END AS sg2,
           |                 CASE WHEN ck % 11 = 0 THEN bc + 100 ELSE bc END AS bc2,
           |                 nk AS nk2
           |          FROM c),
           |d2 AS (SELECT *, (bc2 + 100000) // 100000 AS blk2 FROM dirty),
           |pairs AS (SELECT nm = nm2 AS f1, sg = sg2 AS f2, bc = bc2 AS f3,
           |                 ck = ck2 AS is_match
           |          FROM clean JOIN d2 ON nk = nk2 AND blk = blk2),
           |pat AS (SELECT f1, f2, f3, CAST(count(*) AS BIGINT) AS n_pairs,
           |               CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
           |                 AS n_match
           |        FROM pairs GROUP BY 1, 2, 3),
           |tot AS (SELECT CAST(sum(n_match) AS BIGINT) AS m,
           |               CAST(sum(n_pairs - n_match) AS BIGINT) AS u,
           |               CAST(sum(CASE WHEN f1 THEN n_match ELSE 0 END) AS BIGINT) AS a1,
           |               CAST(sum(CASE WHEN f1 THEN n_pairs - n_match ELSE 0 END) AS BIGINT) AS b1,
           |               CAST(sum(CASE WHEN f2 THEN n_match ELSE 0 END) AS BIGINT) AS a2,
           |               CAST(sum(CASE WHEN f2 THEN n_pairs - n_match ELSE 0 END) AS BIGINT) AS b2,
           |               CAST(sum(CASE WHEN f3 THEN n_match ELSE 0 END) AS BIGINT) AS a3,
           |               CAST(sum(CASE WHEN f3 THEN n_pairs - n_match ELSE 0 END) AS BIGINT) AS b3
           |        FROM pat)
           |SELECT f1, f2, f3, n_pairs, n_match,
           |       CAST((${term(1)}) + (${term(2)}) + (${term(3)}) AS BIGINT)
           |         AS weight_e6
           |FROM pat CROSS JOIN tot""".stripMargin
      }),

    // ── RLE compressibility of each user's event-type stream.
    QueryDef("q_rle_compression",
      (s, d) => Behavior.rleCompression(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "user_id", "t_us", "event_id", "event_type"),
      Some("""WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_id AS tie,
             |                 event_type AS et FROM events),
             |b AS (SELECT u, t, tie,
             |             CASE WHEN lag(et) OVER w IS DISTINCT FROM et
             |                  THEN 1 ELSE 0 END AS brk
             |      FROM e WINDOW w AS (PARTITION BY u ORDER BY t, tie)),
             |r AS (SELECT u, sum(brk) OVER (PARTITION BY u ORDER BY t, tie
             |                               ROWS UNBOUNDED PRECEDING) AS run
             |      FROM b),
             |lens AS (SELECT u, run, CAST(count(*) AS BIGINT) AS len
             |         FROM r GROUP BY 1, 2)
             |SELECT u, CAST(sum(len) AS BIGINT) AS n_events,
             |       CAST(count(*) AS BIGINT) AS n_runs,
             |       CAST(max(len) AS BIGINT) AS max_run,
             |       CAST(count(*) * 1000000 // sum(len) AS BIGINT) AS ratio_e6
             |FROM lens GROUP BY 1""".stripMargin)),

    // ── Inter-centroid distance matrix over the embeddings labels,
    //    nearest-pair flagged.
    QueryDef("q_centroid_matrix",
      (s, d) => ClusterEval.centroidMatrix(Tables.embeddings(s, d)),
      Some("""WITH comp AS MATERIALIZED (
             |  SELECT CAST(label AS BIGINT) AS label,
             |         unnest(list_transform(CAST(embedding AS DOUBLE[]),
             |           x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))) AS v,
             |         unnest(range(1, len(embedding) + 1)) AS i
             |  FROM embeddings),
             |cent AS (SELECT label, i,
             |           CAST(floor(CAST(sum(v) AS DOUBLE) / count(*))
             |             AS BIGINT) AS c
             |         FROM comp GROUP BY 1, 2),
             |d2 AS (SELECT a.label AS la, b.label AS lb,
             |              CAST(sum((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS d2_e12
             |       FROM cent a JOIN cent b ON a.i = b.i AND a.label < b.label
             |       GROUP BY 1, 2),
             |sym AS (SELECT la, lb, d2_e12 FROM d2
             |        UNION ALL SELECT lb, la, d2_e12 FROM d2),
             |mins AS (SELECT la, min(d2_e12) AS mn FROM sym GROUP BY 1)
             |SELECT d2.la AS label_a, d2.lb AS label_b, d2.d2_e12,
             |       (d2.d2_e12 = ma.mn OR d2.d2_e12 = mb.mn) AS is_nn
             |FROM d2 JOIN mins ma ON ma.la = d2.la
             |     JOIN mins mb ON mb.la = d2.lb""".stripMargin))
  )
}
