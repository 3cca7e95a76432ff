package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Graph, Sketches, Stats}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-106 batch: local spatial hotspot detection (Getis–Ord Gi*),
  * the undirected triad census (the graph-structure fingerprint one
  * level up from q_dyad_census), and restricted mean survival time
  * (the clinically-standard scalar summary of the q_kaplan_meier
  * curve). Each runs its heavy phase as one keyed rollup / the shared
  * KM axis walk; everything after rides a bounded axis.
  */
object Round106Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Getis–Ord Gi* hotspot statistic per latitude band (the
    //    q_morans_i axis: 34 bands), neighborhood = band ± 1 incl.
    //    self via a RANGE window frame (gap-safe, unlike a rows
    //    frame). Exact long moments (n·S_i − Sx·w_i etc.); the close
    //    is a fixed-order IEEE sqrt/divide, identical text in both
    //    engines. Gi* > 0 marks a hot band, < 0 a cold one.
    QueryDef("q_getis_ord",
      (s, d) => {
        val bands = Tables.events(s, d)
          .select(expr("(user_id * 37 % 17000) div 500").as("band"))
          .groupBy(col("band")).agg(count(lit(1)).as("x"))
          .localCheckpoint(false) // band axis: window + global moments
        val tot = bands.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(expr("x * x")).as("sxx"))
        val nb = Window.orderBy(col("band")).rangeBetween(-1, 1)
        bands
          .withColumn("s_i", sum(col("x")).over(nb))
          .withColumn("w_i", count(lit(1)).over(nb))
          .crossJoin(broadcast(tot))
          .selectExpr("band", "x", "CAST(w_i AS BIGINT) AS w_i",
            "CAST(s_i AS BIGINT) AS s_i",
            // Gi* is undefined when the neighborhood spans every band
            // (w_i = n) or the band counts are constant — NULL, not inf.
            """CASE WHEN n <= 1 OR n * w_i - w_i * w_i = 0
              |       OR n * sxx - sx * sx = 0 THEN NULL
              |ELSE round(CAST(n * s_i - sx * w_i AS DOUBLE)
              |  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              |     * sqrt(CAST(n * w_i - w_i * w_i AS DOUBLE)
              |            / CAST(n - 1 AS DOUBLE))), 6) END AS gi"""
              .stripMargin)
      },
      Some("""WITH bands AS (
             |  SELECT (user_id * 37 % 17000) // 500 AS band,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |w AS (SELECT band, x,
             |             CAST(count(*) OVER nb AS BIGINT) AS w_i,
             |             CAST(sum(x) OVER nb AS BIGINT) AS s_i
             |      FROM bands
             |      WINDOW nb AS (ORDER BY band
             |        RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS sx,
             |               CAST(sum(x * x) AS BIGINT) AS sxx FROM bands)
             |SELECT band, x, w_i, s_i,
             |       CASE WHEN n <= 1 OR n * w_i - w_i * w_i = 0
             |              OR n * sxx - sx * sx = 0 THEN NULL
             |       ELSE round(CAST(n * s_i - sx * w_i AS DOUBLE)
             |         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             |            * sqrt(CAST(n * w_i - w_i * w_i AS DOUBLE)
             |                   / CAST(n - 1 AS DOUBLE))), 6) END AS gi
             |FROM w CROSS JOIN tot""".stripMargin)),

    // ── Undirected triad census over the q_dyad_census event graph
    //    (user bucket — event bucket, mod 500): how many node triples
    //    are empty / one-edge / two-path / triangle. Closed-form from
    //    exact counts — n, m, wedges P2 = Σ C(d,2), triangles T:
    //      n3 = T,  n2 = P2 − 3T,  n1 = m(n−2) − 2·n2 − 3·n3,
    //      n0 = C(n,3) − n1 − n2 − n3
    //    — no triple enumeration anywhere; the only joins are the two
    //    wedge-closing equi-joins inside the exact triangle count.
    QueryDef("q_triad_census",
      (s, d) => {
        val e = Graph.canonical(Tables.events(s, d)
            .select((col("user_id") % 500).as("a"),
              (col("event_id") % 500).as("b")))
          .localCheckpoint(false) // degrees + triangles + node set
        val nodes = e.select(col("a").as("id"))
          .unionByName(e.select(col("b").as("id"))).distinct()
        val deg = e.select(col("a").as("id"))
          .unionByName(e.select(col("b").as("id")))
          .groupBy(col("id")).agg(count(lit(1)).as("deg"))
        val base = nodes.agg(count(lit(1)).as("n"))
          .crossJoin(e.agg(count(lit(1)).as("m")))
          .crossJoin(deg.agg(sum(expr("deg * (deg - 1) div 2")).as("p2")))
          .crossJoin(Graph.triangleCount(e))
        base.selectExpr("CAST(n AS BIGINT) AS n_nodes",
          "CAST(m AS BIGINT) AS n_edges",
          "CAST(n_triangles AS BIGINT) AS n3",
          "CAST(p2 - 3 * n_triangles AS BIGINT) AS n2",
          """CAST(m * (n - 2) - 2 * (p2 - 3 * n_triangles)
            |  - 3 * n_triangles AS BIGINT) AS n1""".stripMargin,
          """CAST(n * (n - 1) * (n - 2) div 6
            |  - (m * (n - 2) - 2 * (p2 - 3 * n_triangles)
            |     - 3 * n_triangles)
            |  - (p2 - 3 * n_triangles) - n_triangles AS BIGINT)
            |  AS n0""".stripMargin)
      },
      Some("""WITH raw AS (SELECT user_id % 500 AS a, event_id % 500 AS b
             |            FROM events),
             |e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
             |      FROM raw WHERE a <> b),
             |nodes AS (SELECT a AS id FROM e UNION SELECT b FROM e),
             |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg
             |        FROM (SELECT a AS id FROM e
             |              UNION ALL SELECT b FROM e)
             |        GROUP BY 1),
             |tri AS (SELECT CAST(count(*) AS BIGINT) AS t
             |        FROM e e1 JOIN e e2 ON e2.a = e1.b
             |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |base AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes)
             |                  AS n,
             |                (SELECT CAST(count(*) AS BIGINT) FROM e) AS m,
             |                (SELECT CAST(sum(deg * (deg - 1) // 2)
             |                   AS BIGINT) FROM deg) AS p2,
             |                (SELECT t FROM tri) AS t)
             |SELECT n AS n_nodes, m AS n_edges, t AS n3,
             |       p2 - 3 * t AS n2,
             |       m * (n - 2) - 2 * (p2 - 3 * t) - 3 * t AS n1,
             |       CAST(n * (n - 1) * (n - 2) // 6
             |         - (m * (n - 2) - 2 * (p2 - 3 * t) - 3 * t)
             |         - (p2 - 3 * t) - t AS BIGINT) AS n0
             |FROM base""".stripMargin)),

    // ── Restricted mean survival time at τ = 365 days over the
    //    q_kaplan_meier churn subjects: the area under the KM step
    //    curve up to τ — "expected days retained in the first year",
    //    the standard scalar when median survival is undefined. The
    //    step integral rides the bounded event-time axis the shared
    //    [[Stats.kaplanMeier]] walk already produces; all-integer
    //    (surv_e6 × day widths), so the area is exact in e6·days.
    QueryDef("q_rmst",
      (s, d) => {
        val tau = 365L
        val km = Stats.kaplanMeier(
          Tables.orders(s, d)
            .withColumn("day", expr(
              "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"))
            .groupBy(col("o_custkey"))
            .agg(min(col("day")).as("f"), max(col("day")).as("l"))
            .crossJoin(broadcast(
              Tables.orders(s, d).agg(max(expr(
                "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"))
                .as("e"))))
            .select((col("l") - col("f")).as("t"),
              when(col("e") - col("l") > 60L, 1L).otherwise(0L).as("ev")),
          "t", "ev")
        val seg = km
          .withColumn("tn", coalesce(
            lead(col("t"), 1).over(Window.orderBy(col("t"))), lit(tau)))
          .agg(count(lit(1)).as("n_event_times"),
            min(col("t")).as("t1"),
            sum(expr(s"surv_e6 * (least(tn, $tau) - least(t, $tau))"))
              .as("tail_e6"))
        seg.selectExpr(s"CAST($tau AS BIGINT) AS tau",
          "CAST(n_event_times AS BIGINT) AS n_event_times",
          s"""1000000 * coalesce(least(t1, $tau), $tau)
             |  + coalesce(tail_e6, 0) AS rmst_e6""".stripMargin)
      },
      Some {
        val stepL = Bm25.log2E6Sql("(n_risk - d)") + " - " +
          Bm25.log2E6Sql("n_risk")
        s"""WITH od AS (SELECT o_custkey,
           |                 epoch_us(o_orderdate) // 86400000000 AS day
           |           FROM orders),
           |cu AS (SELECT o_custkey, min(day) AS f, max(day) AS l
           |       FROM od GROUP BY 1),
           |g AS (SELECT max(day) AS e FROM od),
           |subj AS (SELECT l - f AS t,
           |                CASE WHEN e - l > 60 THEN 1 ELSE 0 END AS ev
           |         FROM cu CROSS JOIN g),
           |grp AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
           |               CAST(count(*) AS BIGINT) AS leave
           |        FROM subj GROUP BY t),
           |tot AS (SELECT CAST(sum(leave) AS BIGINT) AS n_all FROM grp),
           |walk AS (SELECT t, d, leave,
           |            CAST(n_all - (sum(leave) OVER w - leave) AS BIGINT)
           |              AS n_risk
           |         FROM grp CROSS JOIN tot
           |         WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
           |evs AS (SELECT t, n_risk, d FROM walk WHERE d > 0),
           |sc AS (SELECT t, n_risk, d,
           |          CAST(sum(CASE WHEN n_risk > d THEN $stepL ELSE 0 END)
           |            OVER w AS BIGINT) AS sl,
           |          max(CASE WHEN n_risk = d THEN 1 ELSE 0 END) OVER w
           |            AS dead
           |       FROM evs WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
           |km AS (SELECT t,
           |          CAST(CASE WHEN dead = 1 THEN 0
           |               ELSE ${Sketches.pow2NegE6Sql("(0 - sl)")} END
           |            AS BIGINT) AS surv_e6
           |       FROM sc),
           |l AS (SELECT t, surv_e6,
           |             coalesce(lead(t, 1) OVER (ORDER BY t), 365) AS tn
           |      FROM km),
           |seg AS (SELECT CAST(count(*) AS BIGINT) AS n_event_times,
           |               min(t) AS t1,
           |               CAST(sum(surv_e6
           |                 * (least(tn, 365) - least(t, 365)))
           |                 AS BIGINT) AS tail_e6
           |        FROM l)
           |SELECT CAST(365 AS BIGINT) AS tau, n_event_times,
           |       CAST(1000000 * coalesce(least(t1, 365), 365)
           |         + coalesce(tail_e6, 0) AS BIGINT) AS rmst_e6
           |FROM seg""".stripMargin
      })
  )
}
