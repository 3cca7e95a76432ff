package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-101 batch: Chao1 species richness (how much vocabulary the
  * corpus has NOT shown yet), sequential pattern mining (ordered pairs
  * — the order-sensitive sibling of the itemset queries), and Cook's
  * distance regression influence diagnostics.
  */
object Round101Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Chao1 richness per source over trigram species:
    //    Ŝ = S_obs + N₁(N₁−1)/(2(N₂+1)) (bias-corrected form — defined
    //    even when N₂=0). The gap Ŝ − S_obs estimates how many unseen
    //    trigram types more data from this source would reveal — the
    //    "is this source mined out?" curation signal. One corpus scan;
    //    everything after the species-count shuffle is per-source rows.
    QueryDef("q_chao1",
      (s, d) => Tables.documents(s, d)
        .withColumn("ws", split(col("text"), " "))
        .select(col("source"), explode(expr(
          """CASE WHEN size(ws) >= 3
            |  THEN transform(sequence(1, size(ws) - 2),
            |                 i -> concat_ws(' ', slice(ws, i, 3)))
            |  ELSE slice(ws, 1, 0) END""".stripMargin)).as("g"))
        .groupBy(col("source"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("s_obs"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
        .withColumn("chao1_e6",
          expr("s_obs * 1000000 + n1 * (n1 - 1) * 1000000 div (2 * (n2 + 1))")),
      Some("""WITH g AS (SELECT source,
             |                  unnest(list_transform(range(1, len(ws) - 1),
             |                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
             |                    AS g
             |           FROM (SELECT source, string_split(text, ' ') AS ws
             |                 FROM documents) t),
             |c AS (SELECT source, g, CAST(count(*) AS BIGINT) AS c
             |      FROM g GROUP BY 1, 2)
             |SELECT source, CAST(count(*) AS BIGINT) AS s_obs,
             |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |       CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |       CAST(count(*) AS BIGINT) * 1000000
             |         + CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |           * (CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) - 1)
             |           * 1000000
             |           // (2 * (CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
             |                AS BIGINT) + 1)) AS chao1_e6
             |FROM c GROUP BY source""".stripMargin)),

    // ── Sequential 2-patterns (PrefixSpan depth-1 slice): for each
    //    user, the FIRST occurrence of each event type; directed pair
    //    a→b supported when first(a) precedes first(b) under the
    //    (ts, type) total order. Support = users with the pattern ÷
    //    active users. Order-sensitive — the itemset queries can't see
    //    the difference between signup→purchase and purchase→signup.
    //    Self-join stays within user (≤ |types|² rows each).
    QueryDef("q_seq_patterns",
      (s, d) => {
        val firsts = Tables.events(s, d)
          .groupBy(col("user_id"), col("event_type"))
          .agg(min(expr("unix_micros(ts)")).as("f_us"))
          .localCheckpoint(false) // both sides of the in-user pair join
        val tot = firsts.agg(countDistinct(col("user_id")).as("n_users"))
        val b = firsts.select(col("user_id"),
          col("event_type").as("cons"), col("f_us").as("f_b"))
        firsts.join(b, "user_id")
          .where(col("f_us") < col("f_b") ||
            (col("f_us") === col("f_b") && col("event_type") < col("cons")))
          .groupBy(col("event_type").as("ante"), col("cons"))
          .agg(countDistinct(col("user_id")).as("n_pair"))
          .crossJoin(broadcast(tot))
          .withColumn("support_e6", expr("n_pair * 1000000 div n_users"))
          .where(col("support_e6") >= 100000)
          .select(col("ante"), col("cons"), col("n_pair"), col("support_e6"))
      },
      Some("""WITH f AS (SELECT user_id, event_type,
             |                  min(epoch_us(ts)) AS f_us
             |           FROM events GROUP BY 1, 2),
             |t AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |      FROM f),
             |p AS (SELECT a.event_type AS ante, b.event_type AS cons,
             |             CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_pair
             |      FROM f a JOIN f b ON a.user_id = b.user_id
             |      WHERE a.f_us < b.f_us
             |         OR (a.f_us = b.f_us AND a.event_type < b.event_type)
             |      GROUP BY 1, 2)
             |SELECT ante, cons, n_pair, n_pair * 1000000 // n_users AS support_e6
             |FROM p CROSS JOIN t
             |WHERE n_pair * 1000000 // n_users >= 100000""".stripMargin)),

    // ── Cook's distance: per-day influence on the daily-mean-vs-time
    //    OLS fit — D_i = e_i²·h_i/(p·s²·(1−h_i)²), p=2. Moment sums
    //    stay exact longs (centered day index); only the final ratios
    //    run in doubles (explicit casts, IEEE ops, round 6 — the
    //    trendSlope convention). Top-3 most influential days.
    QueryDef("q_cooks_distance",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
          .groupBy(col("day"))
          .agg(sum(col("cents")).as("sc"), count(lit(1)).as("cnt"))
          .withColumn("y", expr("sc div cnt"))
          .withColumn("t", expr("day - min(day) OVER ()"))
          .localCheckpoint(false) // moments + the per-day pass reuse it
        val m = daily.agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
          sum(col("y")).as("sy"), sum(expr("t * y")).as("sty"),
          sum(expr("t * t")).as("stt"))
        val e = daily.crossJoin(broadcast(m))
          .withColumn("slope", expr(
            """(CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
              |  - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
              | / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
              |  - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))""".stripMargin))
          .withColumn("res", expr(
            """CAST(y AS DOUBLE) - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
              | + slope * (CAST(t AS DOUBLE) - CAST(st AS DOUBLE)
              |            / CAST(n AS DOUBLE)))""".stripMargin))
          .withColumn("h", expr(
            """CAST(1 AS DOUBLE) / CAST(n AS DOUBLE)
              | + (CAST(t AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
              |   * (CAST(t AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
              | / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)
              |    * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))""".stripMargin))
          .withColumn("s2", expr(
            "sum(res * res) OVER () / (CAST(n AS DOUBLE) - CAST(2 AS DOUBLE))"))
          .withColumn("cooks", expr(
            """res * res * h / (CAST(2 AS DOUBLE) * s2
              | * (CAST(1 AS DOUBLE) - h) * (CAST(1 AS DOUBLE) - h))""".stripMargin))
        e.withColumn("rk", row_number().over(
            Window.orderBy(col("cooks").desc, col("day"))))
          .where(col("rk") <= 3)
          .selectExpr("CAST(rk AS BIGINT) AS rk", "day", "y AS y_cents",
            "round(h, 6) AS leverage", "round(cooks, 6) AS cooks_d")
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |                      CAST(sum(CAST(floor(value * 100 + 0.5)
             |                        AS BIGINT)) AS BIGINT) AS sc,
             |                      CAST(count(*) AS BIGINT) AS cnt
             |               FROM events GROUP BY 1),
             |ax AS (SELECT day, sc // cnt AS y,
             |              day - min(day) OVER () AS t FROM daily),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(t) AS BIGINT) AS st,
             |             CAST(sum(y) AS BIGINT) AS sy,
             |             CAST(sum(t * y) AS BIGINT) AS sty,
             |             CAST(sum(t * t) AS BIGINT) AS stt FROM ax),
             |e AS (SELECT day, y, t, n, st, sy, stt,
             |             (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
             |              - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
             |             / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
             |              - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS slope
             |      FROM ax CROSS JOIN m),
             |r AS (SELECT day, y, n,
             |             CAST(y AS DOUBLE) - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
             |               + slope * (CAST(t AS DOUBLE)
             |                 - CAST(st AS DOUBLE) / CAST(n AS DOUBLE))) AS res,
             |             CAST(1 AS DOUBLE) / CAST(n AS DOUBLE)
             |               + (CAST(t AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
             |                 * (CAST(t AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
             |                 / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)
             |                    * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) AS h
             |      FROM e),
             |q AS (SELECT day, y, res, h,
             |             sum(res * res) OVER () / (CAST(n AS DOUBLE)
             |               - CAST(2 AS DOUBLE)) AS s2
             |      FROM r),
             |k AS (SELECT day, y, h,
             |             res * res * h / (CAST(2 AS DOUBLE) * s2
             |               * (CAST(1 AS DOUBLE) - h)
             |               * (CAST(1 AS DOUBLE) - h)) AS cooks
             |      FROM q)
             |SELECT rk, day, y AS y_cents, round(h, 6) AS leverage,
             |       round(cooks, 6) AS cooks_d
             |FROM (SELECT *, CAST(row_number() OVER (ORDER BY cooks DESC,
             |        day) AS BIGINT) AS rk FROM k)
             |WHERE rk <= 3""".stripMargin))
  )
}
