package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.functions._

/** Round-195 batch — market concentration, series regularity, fractal
  * geometry, and rank-based serial dependence:
  *
  *  - Herfindahl–Hirschman (`q_herfindahl`): brand-level revenue
  *    concentration — HHI = Σsᵢ², the normalized (HHI−1/n)/(1−1/n),
  *    and the effective number of competitors 1/HHI. The market-level
  *    companion to q_supply_concentration (per-part) and q_gini;
  *    exact integer e6 through decimal squares.
  *  - Sample entropy (`q_sample_entropy`): SampEn(m=1, r = mean/10) of
  *    daily revenue — −ln(A/B) where B counts value-close day pairs
  *    and A additionally requires the NEXT consecutive days to match
  *    (gap days drop out of both sides, documented). Pair counting is
  *    a calendar-bounded broadcast self-join; the log close rides the
  *    shared integer log₂.
  *  - Box-counting dimension (`q_box_counting`): occupied (time, value)
  *    boxes of the normalized daily-revenue curve at dyadic scales
  *    2⁰..2⁷, then the exact 8-point OLS slope of log₂N on scale
  *    exponent — a curve-roughness readout next to q_hurst. Grid
  *    snapping, box counting and the OLS close are all integer.
  *  - Rank von Neumann (`q_rank_von_neumann`): successive-difference
  *    ratio of day-revenue RANKS, v = Σ(rₜ−rₜ₊₁)² normalized by
  *    n(n²−1)/12 — the distribution-free serial-dependence twin of
  *    q_von_neumann (values). Ranks come from the same bounded
  *    self-join (count-smaller + date tie-break), never a
  *    single-partition window.
  *
  * Scale shapes: one fact-sized exchange each (brand agg / daily agg);
  * everything after rides ≤few-thousand-row calendar-bounded frames,
  * broadcast where self-joined. */
object Round195Queries {

  private val dec = "decimal(38,0)"

  /** daily revenue in hecto-dollars + dense day rank via self-join. */
  private val dailySql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS dt,
      |         CAST(sum(CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT))
      |           AS BIGINT) AS x
      |  FROM orders GROUP BY 1)""".stripMargin

  private def daily(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .groupBy(col("o_orderdate").as("dt"))
      .agg(sum(expr("CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT)"))
        .as("x"))
      .localCheckpoint(false) // calendar-bounded, self-joined

  def defs: Seq[QueryDef] = Seq(

    // ── HHI of brand revenue concentration.
    QueryDef("q_herfindahl",
      (s, d) => {
        val brands = Tables.lineitem(s, d)
          .join(Tables.part(s, d).select(col("p_partkey").as("l_partkey"),
            col("p_brand").as("brand")), Seq("l_partkey"))
          .groupBy(col("brand"))
          .agg(sum(expr("CAST(floor(l_extendedprice * (1 - l_discount)" +
            " * 100 + 0.5) AS BIGINT)")).as("v"))
          .localCheckpoint(false) // ≤ 25 brands
        val tot = brands.agg(count(lit(1)).as("nb"), sum(col("v")).as("vt"))
        brands.crossJoin(broadcast(tot))
          .agg(max(col("nb")).as("nb"), max(col("vt")).as("vt"),
            sum(expr(s"CAST(v AS $dec) * v")).as("sv2"))
          .selectExpr("nb",
            s"""CAST(CAST(sv2 AS $dec) * 1000000
               |  div (CAST(vt AS $dec) * vt) AS BIGINT)
               |  AS hhi_e6""".stripMargin)
          .selectExpr("nb", "hhi_e6",
            """CASE WHEN nb < 2 THEN NULL
              |ELSE (hhi_e6 - 1000000 div nb) * 1000000
              |  div (1000000 - 1000000 div nb)
              |END AS hhi_norm_e6""".stripMargin,
            """CASE WHEN hhi_e6 = 0 THEN NULL
              |ELSE 1000000000000 div hhi_e6
              |END AS effective_n_e6""".stripMargin)
      },
      Some("""WITH brands AS (
             |  SELECT p_brand AS brand,
             |         CAST(sum(CAST(floor(l_extendedprice
             |           * (1 - l_discount) * 100 + 0.5) AS BIGINT))
             |           AS BIGINT) AS v
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS nb,
             |          CAST(sum(v) AS BIGINT) AS vt FROM brands),
             |ag AS (SELECT max(nb) AS nb, max(vt) AS vt,
             |         CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sv2
             |       FROM brands CROSS JOIN tot),
             |k AS (SELECT nb,
             |        CAST(CAST(sv2 AS HUGEINT) * 1000000
             |          // (CAST(vt AS HUGEINT) * vt) AS BIGINT) AS hhi_e6
             |      FROM ag)
             |SELECT nb, hhi_e6,
             |       CASE WHEN nb < 2 THEN NULL
             |       ELSE (hhi_e6 - 1000000 // nb) * 1000000
             |         // (1000000 - 1000000 // nb)
             |       END AS hhi_norm_e6,
             |       CASE WHEN hhi_e6 = 0 THEN NULL
             |       ELSE 1000000000000 // hhi_e6
             |       END AS effective_n_e6
             |FROM k""".stripMargin)),

    // ── SampEn(m=1) of daily revenue with consecutive-day templates.
    QueryDef("q_sample_entropy",
      (s, d) => {
        val dl = daily(s, d)
        val nxt = dl.as("a").join(broadcast(dl.as("b")),
            expr("b.dt = date_add(a.dt, 1)"))
          .select(col("a.dt").as("dt"), col("a.x").as("x"),
            col("b.x").as("xn"))
          .localCheckpoint(false) // days with a next calendar day
        val r = dl.agg(expr("(sum(x) div count(*)) div 10").as("r"))
        val pairs = nxt.as("p").join(broadcast(nxt.as("q")),
            col("p.dt") < col("q.dt"))
          .crossJoin(broadcast(r))
          .agg(count(lit(1)).as("np"),
            sum(when(expr("abs(p.x - q.x) <= r"), 1L).otherwise(0L))
              .as("b1"),
            sum(when(expr("abs(p.x - q.x) <= r" +
              " AND abs(p.xn - q.xn) <= r"), 1L).otherwise(0L))
              .as("a2"))
        pairs
          .withColumn("lb", Bm25.log2E6(col("b1")))
          .withColumn("la", Bm25.log2E6(col("a2")))
          .selectExpr("np", "b1", "a2",
            """CASE WHEN a2 = 0 OR b1 = 0 THEN NULL
              |ELSE (lb - la) * 693147 div 1000000
              |END AS sampen_e6""".stripMargin)
      },
      Some {
        def L(v: String) = s"CAST(${Bm25.log2E6Sql(v)} AS BIGINT)"
        dailySql +
          s""",
             |nxt AS (SELECT a.dt, a.x, b.x AS xn
             |        FROM daily a JOIN daily b ON b.dt = a.dt + 1),
             |r AS (SELECT (sum(x) // count(*)) // 10 AS r FROM daily),
             |pairs AS (SELECT CAST(count(*) AS BIGINT) AS np,
             |    CAST(sum(CASE WHEN abs(p.x - q.x) <= r
             |      THEN 1 ELSE 0 END) AS BIGINT) AS b1,
             |    CAST(sum(CASE WHEN abs(p.x - q.x) <= r
             |      AND abs(p.xn - q.xn) <= r THEN 1 ELSE 0 END)
             |      AS BIGINT) AS a2
             |  FROM nxt p JOIN nxt q ON p.dt < q.dt CROSS JOIN r)
             |SELECT np, b1, a2,
             |       CASE WHEN a2 = 0 OR b1 = 0 THEN NULL
             |       ELSE (${L("b1")} - ${L("a2")}) * 693147 // 1000000
             |       END AS sampen_e6
             |FROM pairs""".stripMargin
      }),

    // ── Box-counting dimension of the normalized daily-revenue curve.
    QueryDef("q_box_counting",
      (s, d) => {
        val dl = daily(s, d)
        val rng = dl.agg(min(col("x")).as("lo"), max(col("x")).as("hi"),
          min(col("dt")).as("d0"))
        val norm = dl.crossJoin(broadcast(rng))
          .selectExpr("datediff(dt, d0) AS t",
            """CASE WHEN hi = lo THEN 0
              |ELSE (x - lo) * 1023 div (hi - lo) END AS rv""".stripMargin)
        val scales = norm
          .withColumn("k", explode(array((0 to 7).map(lit(_)): _*)))
          .selectExpr("k", "t div shiftleft(1, k) AS bt",
            "rv div shiftleft(1, k) AS bv")
          .groupBy(col("k"))
          .agg(countDistinct(col("bt"), col("bv")).as("nb"))
          .localCheckpoint(false) // 8 rows
        scales
          .agg(count(lit(1)).as("m"), sum(col("k")).as("sk"),
            sum(col("k") * col("k")).as("sk2"),
            sum(Bm25.log2E6(col("nb"))).as("sy"),
            sum(col("k") * Bm25.log2E6(col("nb"))).as("sky"),
            max(when(col("k") === 0, col("nb"))).as("n_finest"))
          .selectExpr("m", "n_finest",
            """CASE WHEN m * sk2 - sk * sk = 0 THEN NULL
              |WHEN m * sky - sk * sy <= 0
              |THEN (sk * sy - m * sky) div (m * sk2 - sk * sk)
              |ELSE -((m * sky - sk * sy) div (m * sk2 - sk * sk))
              |END AS dim_e6""".stripMargin)
      },
      Some {
        def L(v: String) = s"CAST(${Bm25.log2E6Sql(v)} AS BIGINT)"
        dailySql +
          s""",
             |rng AS (SELECT min(x) AS lo, max(x) AS hi, min(dt) AS d0
             |        FROM daily),
             |norm AS (SELECT datediff('day', d0, dt) AS t,
             |           CASE WHEN hi = lo THEN 0
             |           ELSE (x - lo) * 1023 // (hi - lo) END AS rv
             |         FROM daily CROSS JOIN rng),
             |scales AS (SELECT k,
             |             CAST(count(DISTINCT (t // (1 << k),
             |               rv // (1 << k))) AS BIGINT) AS nb
             |           FROM norm CROSS JOIN
             |             (SELECT unnest([0,1,2,3,4,5,6,7]) AS k)
             |           GROUP BY 1),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS m,
             |         CAST(sum(k) AS BIGINT) AS sk,
             |         CAST(sum(k * k) AS BIGINT) AS sk2,
             |         CAST(sum(${L("nb")}) AS BIGINT) AS sy,
             |         CAST(sum(k * ${L("nb")}) AS BIGINT) AS sky,
             |         CAST(max(CASE WHEN k = 0 THEN nb END) AS BIGINT)
             |           AS n_finest
             |       FROM scales)
             |SELECT m, n_finest,
             |       CASE WHEN m * sk2 - sk * sk = 0 THEN NULL
             |       WHEN m * sky - sk * sy <= 0
             |       THEN (sk * sy - m * sky) // (m * sk2 - sk * sk)
             |       ELSE -((m * sky - sk * sy) // (m * sk2 - sk * sk))
             |       END AS dim_e6
             |FROM ag""".stripMargin
      }),

    // ── Rank von Neumann successive-difference ratio on day ranks.
    QueryDef("q_rank_von_neumann",
      (s, d) => {
        val dl = daily(s, d)
        val ranked = dl.as("a").crossJoin(broadcast(dl.as("b")))
          .groupBy(col("a.dt").as("dt"), col("a.x").as("x"))
          .agg((lit(1L) + sum(when(col("b.x") < col("a.x") ||
            (col("b.x") === col("a.x") && col("b.dt") < col("a.dt")), 1L)
            .otherwise(0L))).as("r"))
          .localCheckpoint(false)
        val sq = ranked.as("p").join(broadcast(ranked.as("q")),
            expr("q.dt = date_add(p.dt, 1)"))
          .agg(sum(expr("(p.r - q.r) * (p.r - q.r)")).as("sd2"),
            count(lit(1)).as("m"))
        val n = ranked.agg(count(lit(1)).as("n"))
        sq.crossJoin(broadcast(n))
          .selectExpr("n", "m", "sd2",
            s"""CASE WHEN n < 2 THEN NULL
               |ELSE CAST(CAST(sd2 AS $dec) * 12000000
               |  div (CAST(n AS $dec) * (CAST(n AS $dec) * n - 1))
               |  AS BIGINT)
               |END AS rvn_e6""".stripMargin)
      },
      Some(dailySql +
        """,
          |ranked AS (SELECT a.dt, a.x,
          |             1 + CAST(sum(CASE WHEN b.x < a.x
          |               OR (b.x = a.x AND b.dt < a.dt)
          |               THEN 1 ELSE 0 END) AS BIGINT) AS r
          |           FROM daily a LEFT JOIN daily b ON true
          |           GROUP BY 1, 2),
          |sq AS (SELECT CAST(sum((p.r - q.r) * (p.r - q.r)) AS BIGINT)
          |           AS sd2,
          |         CAST(count(*) AS BIGINT) AS m
          |       FROM ranked p JOIN ranked q ON q.dt = p.dt + 1),
          |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked)
          |SELECT n, m, sd2,
          |       CASE WHEN n < 2 THEN NULL
          |       ELSE CAST(CAST(sd2 AS HUGEINT) * 12000000
          |         // (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * n - 1))
          |         AS BIGINT)
          |       END AS rvn_e6
          |FROM sq CROSS JOIN nn""".stripMargin))
  )
}
