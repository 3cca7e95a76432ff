package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-76 batch: bitmap-index intersection (64-bit word-packed user
  * bitmaps per event type, AND-cardinality via popcount — the bitmap
  * mechanism engines use where q_set_ops re-scans rows), historical
  * VaR + expected shortfall (tail risk of daily revenue swings, the
  * finance complement of q_max_drawdown), and robust shape statistics
  * (Bowley skewness + Moors kurtosis from positional octiles — moment-
  * free versions of q_jarque_bera's inputs).
  */
object Round76Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Bitmaps: word = user div 63, bit = user mod 63 (63-bit words: DuckDB range-checks the sign-bit shift); pairwise AND
    //    cardinalities via popcount over the word-aligned join.
    QueryDef("q_bitmap_intersect",
      (s, d) => {
        val bm = Tables.events(s, d)
          .select(col("event_type").as("et"),
            expr("user_id div 63").as("w"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
              .as("bit"))
          .groupBy(col("et"), col("w"))
          .agg(expr("bit_or(bit)").as("bits"))
          .localCheckpoint(false) // both pair sides + per-type counts
        val sizes = bm.groupBy(col("et"))
          .agg(sum(expr("bit_count(bits)")).as("n_users"))
        val b = bm.select(col("et").as("eb"), col("w"),
          col("bits").as("bb"))
        bm.join(b, "w").where(col("et") < col("eb"))
          .groupBy(col("et"), col("eb"))
          .agg(sum(expr("bit_count(bits & bb)")).as("n_and"))
          .join(sizes, "et")
          .join(sizes.select(col("et").as("eb"),
            col("n_users").as("n_b")), "eb")
          .selectExpr("et AS type_a", "eb AS type_b",
            "n_users AS n_a", "n_b", "n_and",
            "n_and * 1000000 div (n_users + n_b - n_and) AS jaccard_e6")
      },
      Some("""WITH bm AS (
             |  SELECT event_type AS et, user_id // 63 AS w,
             |         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63
             |           AS INTEGER)) AS bits
             |  FROM events GROUP BY 1, 2),
             |sizes AS (SELECT et, CAST(sum(bit_count(bits)) AS BIGINT)
             |                 AS n_users
             |          FROM bm GROUP BY 1),
             |pairs AS (
             |  SELECT a.et, b.et AS eb,
             |         CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT)
             |           AS n_and
             |  FROM bm a JOIN bm b ON a.w = b.w AND a.et < b.et
             |  GROUP BY 1, 2)
             |SELECT p.et AS type_a, p.eb AS type_b,
             |       sa.n_users AS n_a, sb.n_users AS n_b, n_and,
             |       n_and * 1000000 // (sa.n_users + sb.n_users - n_and)
             |         AS jaccard_e6
             |FROM pairs p JOIN sizes sa ON sa.et = p.et
             |     JOIN sizes sb ON sb.et = p.eb""".stripMargin)),

    // ── VaR(95) + ES over daily revenue deltas per type; positional
    //    quantile, offset-protected truncating mean for the tail.
    QueryDef("q_var_es",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type").as("et"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            greatest(lit(0L),
              floor(col("value") * 100 + 0.5).cast("long")).as("r"))
          .groupBy(col("et"), col("day")).agg(sum(col("r")).as("x"))
        val chg = daily
          .withColumn("dx", col("x") - lag(col("x"), 1).over(
            Window.partitionBy(col("et")).orderBy(col("day"))))
          .where(col("dx").isNotNull)
          .localCheckpoint(false) // reused: quantile pick + tail mean
        val varq = chg
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("et")).orderBy(col("dx"), col("day"))))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("et"))))
          .where(col("rn") === expr("(n + 19) div 20"))
          .select(col("et"), col("n").as("n_changes"),
            col("dx").as("var_cents"))
        chg.join(broadcast(varq), "et")
          .where(col("dx") <= col("var_cents"))
          .groupBy(col("et"), col("n_changes"), col("var_cents"))
          .agg(count(lit(1)).as("n_tail"), sum(col("dx")).as("s_tail"))
          .selectExpr("et", "n_changes", "var_cents", "n_tail",
            "(s_tail + n_tail * 1000000000) div n_tail - 1000000000 " +
              "AS es_cents")
      },
      Some("""WITH daily AS (
             |  SELECT event_type AS et, epoch_us(ts) // 86400000000 AS day,
             |         CAST(sum(greatest(0,
             |           CAST(floor(value * 100 + 0.5) AS BIGINT)))
             |           AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |chg AS (SELECT et, day, x - lag(x) OVER (PARTITION BY et
             |               ORDER BY day) AS dx
             |        FROM daily),
             |c2 AS (SELECT * FROM chg WHERE dx IS NOT NULL),
             |varq AS (SELECT et, n AS n_changes, dx AS var_cents FROM (
             |           SELECT *, row_number() OVER (PARTITION BY et
             |             ORDER BY dx, day) AS rn,
             |             CAST(count(*) OVER (PARTITION BY et) AS BIGINT)
             |               AS n
             |           FROM c2)
             |         WHERE rn = (n + 19) // 20),
             |tail AS (SELECT c2.et, n_changes, var_cents,
             |                CAST(count(*) AS BIGINT) AS n_tail,
             |                CAST(sum(dx) AS BIGINT) AS s_tail
             |         FROM c2 JOIN varq ON c2.et = varq.et
             |         WHERE dx <= var_cents
             |         GROUP BY 1, 2, 3)
             |SELECT et, n_changes, var_cents, n_tail,
             |       (s_tail + n_tail * 1000000000) // n_tail - 1000000000
             |         AS es_cents
             |FROM tail""".stripMargin)),

    // ── Bowley skewness + Moors kurtosis from positional octiles of
    //    balance cents per segment.
    QueryDef("q_robust_shape",
      (s, d) => {
        val u = Tables.customer(s, d)
          .select(col("c_mktsegment").as("seg"), col("c_custkey").as("ck"),
            floor(col("c_acctbal") * 100 + 0.5).cast("long").as("v"))
        val ranked = u
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("seg")).orderBy(col("v"), col("ck"))))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("seg"))))
          .localCheckpoint(false) // 7 octile picks off one rank pass
        val oct = (1 to 7).map { k =>
          ranked.where(col("rn") === expr(s"($k * n + 7) div 8"))
            .select(col("seg"), col("n"), lit(k).as("k"),
              col("v").as("e"))
        }.reduce(_ unionByName _)
        oct.groupBy(col("seg"), col("n"))
          .pivot("k", 1 to 7).agg(first(col("e")))
          .selectExpr("seg", "CAST(n AS BIGINT) AS n",
            "`2` AS q1_cents", "`4` AS med_cents", "`6` AS q3_cents",
            """CASE WHEN `6` - `2` = 0 THEN NULL
              |     ELSE round(CAST(`2` + `6` - 2 * `4` AS DOUBLE)
              |          / CAST(`6` - `2` AS DOUBLE), 6)
              |END AS bowley_skew""".stripMargin,
            """CASE WHEN `6` - `2` = 0 THEN NULL
              |     ELSE round(CAST((`7` - `5`) + (`3` - `1`) AS DOUBLE)
              |          / CAST(`6` - `2` AS DOUBLE), 6)
              |END AS moors_kurtosis""".stripMargin)
      },
      Some {
        val picks = (1 to 7).map { k =>
          s"""SELECT seg, n, $k AS k, v AS e FROM ranked
             |WHERE rn = ($k * n + 7) // 8""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH u AS (SELECT c_mktsegment AS seg, c_custkey AS ck,
           |                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
           |                   AS v
           |          FROM customer),
           |ranked AS (SELECT seg, v,
           |                  row_number() OVER (PARTITION BY seg
           |                    ORDER BY v, ck) AS rn,
           |                  CAST(count(*) OVER (PARTITION BY seg)
           |                    AS BIGINT) AS n
           |           FROM u),
           |oct AS ($picks),
           |pv AS (SELECT seg, n,
           |              max(CASE WHEN k = 1 THEN e END) AS e1,
           |              max(CASE WHEN k = 2 THEN e END) AS e2,
           |              max(CASE WHEN k = 3 THEN e END) AS e3,
           |              max(CASE WHEN k = 4 THEN e END) AS e4,
           |              max(CASE WHEN k = 5 THEN e END) AS e5,
           |              max(CASE WHEN k = 6 THEN e END) AS e6,
           |              max(CASE WHEN k = 7 THEN e END) AS e7
           |       FROM oct GROUP BY 1, 2)
           |SELECT seg, n, e2 AS q1_cents, e4 AS med_cents, e6 AS q3_cents,
           |       CASE WHEN e6 - e2 = 0 THEN NULL
           |            ELSE round(CAST(e2 + e6 - 2 * e4 AS DOUBLE)
           |                 / CAST(e6 - e2 AS DOUBLE), 6)
           |       END AS bowley_skew,
           |       CASE WHEN e6 - e2 = 0 THEN NULL
           |            ELSE round(CAST((e7 - e5) + (e3 - e1) AS DOUBLE)
           |                 / CAST(e6 - e2 AS DOUBLE), 6)
           |       END AS moors_kurtosis
           |FROM pv""".stripMargin
      })
  )
}
