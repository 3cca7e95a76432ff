package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.functions._

/** Round-85 batch: group-sequential testing (four interim looks against
  * literal O'Brien–Fleming z² bounds, the early-stopping discipline
  * q_sprt does per-event and q_ab_test does once), an ADF-style
  * unit-root probe (Δx on lagged x — is daily volume mean-reverting or
  * a random walk, the stationarity check q_pacf assumes away), and the
  * Theil T inequality index with its between/within-nation
  * decomposition (the additive complement of q_gini/q_lorenz).
  */
object Round85Queries {

  private val dec = "decimal(38,0)"

  /** OBF z²·1e4 bounds for K = 4 equal looks (two-sided α = .05):
    * z = 4.333, 2.963, 2.359, 2.014. */
  private val obf4 = Seq(187749L, 87794L, 55649L, 40562L)

  def defs: Seq[QueryDef] = Seq(

    // ── Group-sequential: looks accumulate ck%4 < k; conversion =
    //    has-order; exact cross-multiplied z² vs the literal bound.
    QueryDef("q_group_sequential",
      (s, d) => {
        val conv = Tables.orders(s, d).select(col("o_custkey")).distinct()
        val u = Tables.customer(s, d)
          .join(conv, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey").as("ck"),
            (col("c_custkey") % 2 === 0).as("arm_a"),
            col("o_custkey").isNotNull.as("cv"))
          .localCheckpoint(false) // reused by the 4 looks
        (1 to 4).map { k =>
          u.where(col("ck") % 4 < k)
            .agg(
              sum(when(col("arm_a"), 1L).otherwise(0L)).cast(dec).as("na"),
              sum(when(!col("arm_a"), 1L).otherwise(0L)).cast(dec).as("nb"),
              sum(when(col("arm_a") && col("cv"), 1L).otherwise(0L))
                .cast(dec).as("ca"),
              sum(when(!col("arm_a") && col("cv"), 1L).otherwise(0L))
                .cast(dec).as("cb"))
            .selectExpr(s"CAST($k AS BIGINT) AS look",
              "CAST(na AS BIGINT) AS n_a", "CAST(nb AS BIGINT) AS n_b",
              "CAST(ca AS BIGINT) AS conv_a", "CAST(cb AS BIGINT) AS conv_b",
              s"""CAST(CASE WHEN na * nb * (ca + cb)
                 |* (na + nb - ca - cb) = 0 THEN 0
                 |ELSE 10000 * (na + nb) * (ca * nb - cb * na)
                 |     * (ca * nb - cb * na)
                 |     div (na * nb * (ca + cb) * (na + nb - ca - cb))
                 |END AS BIGINT) AS z2_e4""".stripMargin,
              s"""CASE WHEN na * nb * (ca + cb)
                 |* (na + nb - ca - cb) = 0 THEN false
                 |ELSE 10000 * (na + nb) * (ca * nb - cb * na)
                 |     * (ca * nb - cb * na)
                 |     > ${obf4(k - 1)} * na * nb * (ca + cb)
                 |       * (na + nb - ca - cb)
                 |END AS crossed""".stripMargin)
        }.reduce(_ unionByName _)
      },
      Some {
        def look(k: Int) =
          s"""SELECT CAST($k AS BIGINT) AS look,
             |       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |       CAST(ca AS BIGINT) AS conv_a,
             |       CAST(cb AS BIGINT) AS conv_b,
             |       CAST(CASE WHEN na * nb * (ca + cb)
             |            * (na + nb - ca - cb) = 0 THEN 0
             |            ELSE 10000 * (na + nb) * (ca * nb - cb * na)
             |                 * (ca * nb - cb * na)
             |                 // (na * nb * (ca + cb)
             |                     * (na + nb - ca - cb))
             |       END AS BIGINT) AS z2_e4,
             |       CASE WHEN na * nb * (ca + cb)
             |            * (na + nb - ca - cb) = 0 THEN false
             |            ELSE 10000 * (na + nb) * (ca * nb - cb * na)
             |                 * (ca * nb - cb * na)
             |                 > ${obf4(k - 1)} * na * nb * (ca + cb)
             |                   * (na + nb - ca - cb)
             |       END AS crossed
             |FROM (SELECT
             |        CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END)
             |          AS HUGEINT) AS na,
             |        CAST(sum(CASE WHEN arm_a THEN 0 ELSE 1 END)
             |          AS HUGEINT) AS nb,
             |        CAST(sum(CASE WHEN arm_a AND cv THEN 1 ELSE 0 END)
             |          AS HUGEINT) AS ca,
             |        CAST(sum(CASE WHEN NOT arm_a AND cv THEN 1 ELSE 0 END)
             |          AS HUGEINT) AS cb
             |      FROM u WHERE ck % 4 < $k)""".stripMargin
        s"""WITH conv AS (SELECT DISTINCT o_custkey FROM orders),
           |u AS (SELECT c_custkey AS ck, c_custkey % 2 = 0 AS arm_a,
           |             o_custkey IS NOT NULL AS cv
           |      FROM customer LEFT JOIN conv ON c_custkey = o_custkey)
           |${(1 to 4).map(look).mkString("\nUNION ALL\n")}""".stripMargin
      }),

    // ── ADF-lite: Δx_t on x_{t−1} per type; φ near 0 ⇒ random walk,
    //    φ near −1 ⇒ strong mean reversion. Exact moments, double close.
    QueryDef("q_adf_lite",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type").as("et"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("et"), col("day")).agg(count(lit(1)).as("c"))
        val p = daily
          .withColumn("xl", lag(col("c"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("et")).orderBy(col("day"))))
          .where(col("xl").isNotNull)
          .select(col("et"), col("xl").cast(dec).as("x"),
            (col("c") - col("xl")).cast(dec).as("y"))
        p.groupBy(col("et"))
          .agg(count(lit(1)).cast(dec).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("y") * col("y")).as("syy"))
          .selectExpr("et", "CAST(n AS BIGINT) AS n",
            """CASE WHEN n * sxx - sx * sx = 0 THEN NULL
              |     ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
              |          / CAST(n * sxx - sx * sx AS DOUBLE), 6)
              |END AS phi""".stripMargin,
            """CASE WHEN n * sxx - sx * sx = 0 OR n <= 2 THEN NULL
              |     ELSE round((CAST(n * sxy - sx * sy AS DOUBLE)
              |            / CAST(n * sxx - sx * sx AS DOUBLE))
              |          / sqrt(((CAST(n * syy - sy * sy AS DOUBLE)
              |                  - CAST(n * sxy - sx * sy AS DOUBLE)
              |                    * CAST(n * sxy - sx * sy AS DOUBLE)
              |                    / CAST(n * sxx - sx * sx AS DOUBLE))
              |                 / CAST(n - 2 AS DOUBLE))
              |                / CAST(n * sxx - sx * sx AS DOUBLE)
              |                * CAST(n AS DOUBLE)), 6)
              |END AS t_stat""".stripMargin)
      },
      Some("""WITH daily AS (SELECT event_type AS et,
             |                     epoch_us(ts) // 86400000000 AS day,
             |                     CAST(count(*) AS BIGINT) AS c
             |              FROM events GROUP BY 1, 2),
             |p AS (SELECT et, CAST(xl AS HUGEINT) AS x,
             |             CAST(c - xl AS HUGEINT) AS y
             |      FROM (SELECT et, c, lag(c) OVER (PARTITION BY et
             |              ORDER BY day) AS xl FROM daily)
             |      WHERE xl IS NOT NULL),
             |m AS (SELECT et, CAST(count(*) AS HUGEINT) AS n,
             |             sum(x) AS sx, sum(y) AS sy,
             |             sum(x * x) AS sxx, sum(x * y) AS sxy,
             |             sum(y * y) AS syy
             |      FROM p GROUP BY 1)
             |SELECT et, CAST(n AS BIGINT) AS n,
             |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
             |            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
             |                 / CAST(n * sxx - sx * sx AS DOUBLE), 6)
             |       END AS phi,
             |       CASE WHEN n * sxx - sx * sx = 0 OR n <= 2 THEN NULL
             |            ELSE round((CAST(n * sxy - sx * sy AS DOUBLE)
             |                   / CAST(n * sxx - sx * sx AS DOUBLE))
             |                 / sqrt(((CAST(n * syy - sy * sy AS DOUBLE)
             |                         - CAST(n * sxy - sx * sy AS DOUBLE)
             |                           * CAST(n * sxy - sx * sy AS DOUBLE)
             |                           / CAST(n * sxx - sx * sx AS DOUBLE))
             |                        / CAST(n - 2 AS DOUBLE))
             |                       / CAST(n * sxx - sx * sx AS DOUBLE)
             |                       * CAST(n AS DOUBLE)), 6)
             |       END AS t_stat
             |FROM m""".stripMargin)),

    // ── Theil T with between/within decomposition over positive
    //    customer spend by nation; fixed-point log₂·ln2 throughout.
    QueryDef("q_theil_index",
      (s, d) => {
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("y"))
        val u = Tables.customer(s, d)
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(col("c_nationkey").cast("long").as("nk"), col("y"))
          .where(col("y") > 0)
          .localCheckpoint(false) // member terms + margins
        val g = u.groupBy(col("nk"))
          .agg(count(lit(1)).as("ng"), sum(col("y")).as("sg"))
        val tot = g.agg(sum(col("ng")).as("n"), sum(col("sg")).as("s"))
        // within-group numerators: Σ y·(lg(y·n_g) − lg(S_g))
        val wg = u.join(broadcast(g), "nk")
          .withColumn("lgdiff",
            Bm25.log2E6(col("y")) + Bm25.log2E6(col("ng")) -
              Bm25.log2E6(col("sg")))
          .groupBy(col("nk"))
          .agg(sum(col("y").cast(dec) * col("lgdiff").cast(dec))
            .as("w_num"))
        g.join(wg, "nk").crossJoin(broadcast(tot))
          .withColumn("t_within_e6", expr(
            s"""CAST(CASE WHEN w_num >= 0
               |THEN w_num * 693147 div (CAST(sg AS $dec) * 1000000)
               |ELSE -((-w_num) * 693147 div (CAST(sg AS $dec) * 1000000))
               |END AS BIGINT)""".stripMargin))
          .withColumn("lgb",
            Bm25.log2E6(col("sg")) + Bm25.log2E6(col("n")) -
              Bm25.log2E6(col("s")) - Bm25.log2E6(col("ng")))
          .selectExpr("nk", "CAST(ng AS BIGINT) AS n_members",
            "sg AS spend_cents", "t_within_e6",
            // between term: (S_g/S)·ln((S_g/S)/(n_g/n)) in e6,
            // sign-factored (below-average groups go negative)
            s"""CAST(CASE WHEN lgb >= 0
               |THEN CAST(sg AS $dec) * CAST(lgb AS $dec) * 693147
               |     div (CAST(s AS $dec) * 1000000000000)
               |ELSE -(CAST(sg AS $dec) * CAST(-lgb AS $dec) * 693147
               |     div (CAST(s AS $dec) * 1000000000000))
               |END AS BIGINT) AS between_term_e6""".stripMargin)
      },
      Some {
        val lgdiff = s"CAST(${Bm25.log2E6Sql("y")} + " +
          s"${Bm25.log2E6Sql("ng")} - ${Bm25.log2E6Sql("sg")} AS BIGINT)"
        val lgb = s"CAST(${Bm25.log2E6Sql("sg")} + " +
          s"${Bm25.log2E6Sql("n")} - ${Bm25.log2E6Sql("s")} - " +
          s"${Bm25.log2E6Sql("ng")} AS BIGINT)"
        s"""WITH spend AS (SELECT o_custkey,
           |                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
           |                   AS BIGINT)) AS BIGINT) AS y
           |               FROM orders GROUP BY 1),
           |u AS (SELECT CAST(c_nationkey AS BIGINT) AS nk, y
           |      FROM customer JOIN spend ON c_custkey = o_custkey
           |      WHERE y > 0),
           |g AS (SELECT nk, CAST(count(*) AS BIGINT) AS ng,
           |             CAST(sum(y) AS BIGINT) AS sg
           |      FROM u GROUP BY 1),
           |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
           |               CAST(sum(sg) AS BIGINT) AS s FROM g),
           |wg AS (SELECT u.nk,
           |              sum(CAST(y AS HUGEINT) * $lgdiff) AS w_num
           |       FROM u JOIN g ON u.nk = g.nk GROUP BY 1)
           |SELECT g.nk, ng AS n_members, sg AS spend_cents,
           |       CAST(CASE WHEN w_num >= 0
           |            THEN w_num * 693147
           |                 // (CAST(sg AS HUGEINT) * 1000000)
           |            ELSE -((-w_num) * 693147
           |                 // (CAST(sg AS HUGEINT) * 1000000))
           |       END AS BIGINT) AS t_within_e6,
           |       CAST(CASE WHEN $lgb >= 0
           |            THEN CAST(sg AS HUGEINT) * ($lgb) * 693147
           |                 // (CAST(s AS HUGEINT) * 1000000000000)
           |            ELSE -(CAST(sg AS HUGEINT) * (-($lgb)) * 693147
           |                 // (CAST(s AS HUGEINT) * 1000000000000))
           |       END AS BIGINT) AS between_term_e6
           |FROM g JOIN wg ON g.nk = wg.nk CROSS JOIN tot""".stripMargin
      })
  )
}
