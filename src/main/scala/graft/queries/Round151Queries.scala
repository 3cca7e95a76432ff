package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-151 batch: operations-analytics trio —
  *
  *  - Little's-law audit (`q_littles_law`): L = λ·W is an identity on
  *    any stationary window; comparing the directly-measured average
  *    work-in-progress L against arrival-rate × residence-time
  *    quantifies boundary clipping / censoring in the pipeline — the
  *    standard sanity gate on latency dashboards.
  *  - Adaptive quadtree cells (`q_quadtree_cells`): split any cell
  *    with more than T points into 4 until depth 5 — the
  *    spatial-skew-aware partitioning a geo engine uses instead of a
  *    uniform grid. Cell ids use the floor-halving identity
  *    (qx_d div 2 = qx_{d-1}), so parents roll up from ONE leaf-depth
  *    aggregate — no per-depth rescans.
  *  - AR(2) Yule–Walker fit (`q_ar2_forecast`): closed-form
  *    autoregression coefficients from integer lag-1/lag-2
  *    autocorrelations (exact decimal(38,0) moments, e6 fixed-point,
  *    sign-factored truncating division) plus the one-step forecast.
  *
  * Scale notes: Little's law is two keyed aggregates over orders (the
  * lineitem max-ship rollup is the only fact-sized shuffle); the
  * quadtree aggregates facts once at leaf depth (≤4096 cells) and
  * rolls parents up on the bounded cell axis; AR(2) reuses the ACF
  * shape — bounded day axis after one fact rollup.
  */
object Round151Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Little's law on the 1996–97 order pipeline: arrival = order
    //    day, departure = last ship day; W = mean residence (days,
    //    e3), λ = orders/day (e3), L = mean open orders measured by
    //    in-window overlap days (e3). ratio_e6 = L/(λW) — below 1e6
    //    exactly when departures clip past the window edge.
    QueryDef("q_littles_law",
      (s, d) => {
        val dep = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(max(expr(
            "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000"))
            .as("dep"))
        Tables.orders(s, d)
          .select(col("o_orderkey"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
              .as("arr"))
          .join(dep, "o_orderkey")
          .selectExpr("arr", "greatest(dep, arr) AS dep",
            "unix_micros(CAST('1996-01-01' AS TIMESTAMP)) div 86400000000 AS d0",
            "unix_micros(CAST('1997-12-31' AS TIMESTAMP)) div 86400000000 AS d1")
          .filter(col("arr") >= col("d0") && col("arr") <= col("d1"))
          .agg(count(lit(1)).as("n"),
            sum(expr("dep - arr + 1")).as("sres"),
            sum(expr("least(dep, d1) - arr + 1")).as("sover"),
            max(expr("d1 - d0 + 1")).as("days"))
          .selectExpr("CAST(n AS BIGINT) AS n_orders",
            "n * 1000 div days AS lambda_e3",
            "sres * 1000 div n AS w_e3",
            "sover * 1000 div days AS l_e3",
            """sover * 1000 div days * 1000000
              |  div greatest(1L, (n * 1000 div days) * (sres * 1000 div n)
              |    div 1000) AS ratio_e6""".stripMargin)
      },
      Some("""WITH dep AS (
             |  SELECT l_orderkey AS o_orderkey,
             |         max(epoch_us(l_shipdate) // 86400000000) AS dep
             |  FROM lineitem GROUP BY 1),
             |o AS (
             |  SELECT epoch_us(o.o_orderdate) // 86400000000 AS arr,
             |         greatest(dep.dep,
             |           epoch_us(o.o_orderdate) // 86400000000) AS dep,
             |         epoch_us(TIMESTAMP '1996-01-01') // 86400000000 AS d0,
             |         epoch_us(TIMESTAMP '1997-12-31') // 86400000000 AS d1
             |  FROM orders o JOIN dep ON o.o_orderkey = dep.o_orderkey),
             |a AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(dep - arr + 1) AS BIGINT) AS sres,
             |         CAST(sum(least(dep, d1) - arr + 1) AS BIGINT) AS sover,
             |         CAST(max(d1 - d0 + 1) AS BIGINT) AS days
             |  FROM o WHERE arr >= d0 AND arr <= d1)
             |SELECT n AS n_orders,
             |       n * 1000 // days AS lambda_e3,
             |       sres * 1000 // n AS w_e3,
             |       sover * 1000 // days AS l_e3,
             |       sover * 1000 // days * 1000000
             |         // greatest(1, (n * 1000 // days) * (sres * 1000 // n)
             |           // 1000) AS ratio_e6
             |FROM a""".stripMargin)),

    // ── Adaptive quadtree: leaf depth 5 (32×32 scaled cell ids via
    //    la·2^d div extent — floor-halving gives parents for free);
    //    emit a cell at depth d when it holds ≤ T = 1000 points but
    //    its parent holds more; depth-5 cells still over T emit with
    //    overflow = 1 (the unsplittable hot spots a partitioner must
    //    salt).
    QueryDef("q_quadtree_cells",
      (s, d) => {
        val t = 1000L
        val leaf = Tables.events(s, d)
          .selectExpr(
            "((user_id * 37 + event_id * 13) % 17000) * 32 div 17000 AS qx",
            "((user_id * 91 + event_id * 29) % 35000) * 32 div 35000 AS qy")
          .groupBy(col("qx"), col("qy")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint(false)
        // parents roll up on the ≤4096-cell axis — no fact rescans; each
        // level checkpoints because it feeds TWO consumers (as child and
        // as parent) and would otherwise replay its rollup lineage twice
        def up(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(expr("qx div 2").as("qx"), expr("qy div 2").as("qy"))
          .agg(sum(col("cnt")).as("cnt"))
          .localCheckpoint(false)
        val levels = Iterator.iterate(leaf)(up).take(6).toSeq // d5..d0
        val emitted = (1 to 5).map { dd =>
          val child = levels(5 - dd)
          val parent = levels(5 - dd + 1)
            .select(expr("qx").as("px"), expr("qy").as("py"),
              col("cnt").as("pcnt"))
          child.join(broadcast(parent),
              expr("qx div 2") === col("px") &&
                expr("qy div 2") === col("py"))
            .filter(col("cnt") <= t && col("pcnt") > t)
            .selectExpr(s"CAST($dd AS BIGINT) AS depth",
              "CAST(qx AS BIGINT) AS qx", "CAST(qy AS BIGINT) AS qy",
              "CAST(cnt AS BIGINT) AS n_points", "CAST(0 AS BIGINT) AS overflow")
        }
        val overflow = levels(0).filter(col("cnt") > t)
          .selectExpr("CAST(5 AS BIGINT) AS depth",
            "CAST(qx AS BIGINT) AS qx", "CAST(qy AS BIGINT) AS qy",
            "CAST(cnt AS BIGINT) AS n_points", "CAST(1 AS BIGINT) AS overflow")
        emitted.reduce(_ unionByName _).unionByName(overflow)
      },
      Some("""WITH pts AS (
             |  SELECT ((user_id * 37 + event_id * 13) % 17000) * 32
             |           // 17000 AS qx,
             |         ((user_id * 91 + event_id * 29) % 35000) * 32
             |           // 35000 AS qy
             |  FROM events),
             |c5 AS (SELECT qx, qy, CAST(count(*) AS BIGINT) AS cnt
             |       FROM pts GROUP BY 1, 2),
             |c4 AS (SELECT qx // 2 AS qx, qy // 2 AS qy,
             |              CAST(sum(cnt) AS BIGINT) AS cnt
             |       FROM c5 GROUP BY 1, 2),
             |c3 AS (SELECT qx // 2 AS qx, qy // 2 AS qy,
             |              CAST(sum(cnt) AS BIGINT) AS cnt
             |       FROM c4 GROUP BY 1, 2),
             |c2 AS (SELECT qx // 2 AS qx, qy // 2 AS qy,
             |              CAST(sum(cnt) AS BIGINT) AS cnt
             |       FROM c3 GROUP BY 1, 2),
             |c1 AS (SELECT qx // 2 AS qx, qy // 2 AS qy,
             |              CAST(sum(cnt) AS BIGINT) AS cnt
             |       FROM c2 GROUP BY 1, 2),
             |c0 AS (SELECT qx // 2 AS qx, qy // 2 AS qy,
             |              CAST(sum(cnt) AS BIGINT) AS cnt
             |       FROM c1 GROUP BY 1, 2)
             |SELECT CAST(1 AS BIGINT) AS depth, c.qx, c.qy,
             |       c.cnt AS n_points, CAST(0 AS BIGINT) AS overflow
             |FROM c1 c JOIN c0 p ON c.qx // 2 = p.qx AND c.qy // 2 = p.qy
             |WHERE c.cnt <= 1000 AND p.cnt > 1000
             |UNION ALL
             |SELECT 2, c.qx, c.qy, c.cnt, 0
             |FROM c2 c JOIN c1 p ON c.qx // 2 = p.qx AND c.qy // 2 = p.qy
             |WHERE c.cnt <= 1000 AND p.cnt > 1000
             |UNION ALL
             |SELECT 3, c.qx, c.qy, c.cnt, 0
             |FROM c3 c JOIN c2 p ON c.qx // 2 = p.qx AND c.qy // 2 = p.qy
             |WHERE c.cnt <= 1000 AND p.cnt > 1000
             |UNION ALL
             |SELECT 4, c.qx, c.qy, c.cnt, 0
             |FROM c4 c JOIN c3 p ON c.qx // 2 = p.qx AND c.qy // 2 = p.qy
             |WHERE c.cnt <= 1000 AND p.cnt > 1000
             |UNION ALL
             |SELECT 5, c.qx, c.qy, c.cnt, 0
             |FROM c5 c JOIN c4 p ON c.qx // 2 = p.qx AND c.qy // 2 = p.qy
             |WHERE c.cnt <= 1000 AND p.cnt > 1000
             |UNION ALL
             |SELECT 5, qx, qy, cnt, 1 FROM c5 WHERE cnt > 1000"""
        .stripMargin)),

    // ── AR(2) by Yule–Walker over each event type's daily-count
    //    series: r1, r2 from exact centered moments (decimal(38,0)
    //    sums → e6), then φ1 = r1(1−r2)/(1−r1²), φ2 = (r2−r1²)/(1−r1²)
    //    and the one-step forecast μ + φ1(xₙ−μ) + φ2(xₙ₋₁−μ), all in
    //    sign-factored e6 integer arithmetic.
    QueryDef("q_ar2_forecast",
      (s, d) => {
        val dec = "decimal(38,0)"
        val ax = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).cast(dec).as("x"))
          .localCheckpoint(false)
        val tot = ax.groupBy(col("event_type"))
          .agg(count(lit(1)).cast(dec).as("n"), sum(col("x")).as("s"),
            max(struct(col("day"), col("x"))).getField("x").as("xn"))
        val xn1 = ax.join(
            ax.groupBy(col("event_type")).agg(max(col("day")).as("md")),
            "event_type")
          .filter(col("day") < col("md"))
          .groupBy(col("event_type"))
          .agg(max(struct(col("day"), col("x"))).getField("x").as("xn1"))
        val cen = ax.join(broadcast(tot), "event_type")
          .select(col("event_type"), col("day"),
            (col("n") * col("x") - col("s")).as("c"))
          .localCheckpoint(false)
        val den = cen.groupBy(col("event_type"))
          .agg(sum(col("c") * col("c")).as("den"))
        val nums = cen
          .select(col("event_type"), col("day"), col("c"),
            explode(expr("sequence(1, 2)")).as("lag"))
          .withColumn("pd", col("day") + col("lag"))
          .join(cen.select(col("event_type"), col("day").as("pd"),
            col("c").as("cl")), Seq("event_type", "pd"))
          .groupBy(col("event_type"))
          .agg(sum(when(col("lag") === 1, col("c") * col("cl"))
            .otherwise(lit(0).cast(dec))).as("num1"),
            sum(when(col("lag") === 2, col("c") * col("cl"))
              .otherwise(lit(0).cast(dec))).as("num2"))
        val rs = nums.join(broadcast(den), "event_type")
          .selectExpr("event_type",
            """CAST(CASE WHEN num1 >= 0
              |  THEN (num1 * 1000000) div greatest(CAST(1 AS decimal(38,0)), den)
              |  ELSE -((-num1 * 1000000) div greatest(CAST(1 AS decimal(38,0)), den))
              |END AS BIGINT) AS r1""".stripMargin,
            """CAST(CASE WHEN num2 >= 0
              |  THEN (num2 * 1000000) div greatest(CAST(1 AS decimal(38,0)), den)
              |  ELSE -((-num2 * 1000000) div greatest(CAST(1 AS decimal(38,0)), den))
              |END AS BIGINT) AS r2""".stripMargin)
        val phi = rs.selectExpr("event_type", "r1", "r2",
          "greatest(1L, 1000000000000L - r1 * r1) AS dphi",
          "r1 * (1000000 - r2) AS n1",
          "r2 * 1000000 - r1 * r1 AS n2")
          .selectExpr("event_type", "r1", "r2",
            """CASE WHEN n1 >= 0 THEN n1 * 1000000 div dphi
              |ELSE -((-n1) * 1000000 div dphi) END AS phi1_e6""".stripMargin,
            """CASE WHEN n2 >= 0 THEN n2 * 1000000 div dphi
              |ELSE -((-n2) * 1000000 div dphi) END AS phi2_e6""".stripMargin)
        phi.join(broadcast(tot.selectExpr("event_type",
            "CAST(s * 1000000 div n AS BIGINT) AS mu_e6",
            "CAST(xn AS BIGINT) AS xn")), "event_type")
          .join(broadcast(xn1.selectExpr("event_type",
            "CAST(xn1 AS BIGINT) AS xn1")), "event_type")
          .selectExpr("event_type", "r1", "r2", "phi1_e6", "phi2_e6",
            """mu_e6 + CASE WHEN phi1_e6 * (xn * 1000000 - mu_e6) >= 0
              |  THEN phi1_e6 * (xn * 1000000 - mu_e6) div 1000000
              |  ELSE -((-(phi1_e6 * (xn * 1000000 - mu_e6))) div 1000000)
              |END + CASE WHEN phi2_e6 * (xn1 * 1000000 - mu_e6) >= 0
              |  THEN phi2_e6 * (xn1 * 1000000 - mu_e6) div 1000000
              |  ELSE -((-(phi2_e6 * (xn1 * 1000000 - mu_e6))) div 1000000)
              |END AS forecast_e6""".stripMargin)
      },
      Some("""WITH ax AS (
             |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             |         count(*) AS x
             |  FROM events GROUP BY 1, 2),
             |tot AS (SELECT event_type, count(*) AS n, sum(x) AS s,
             |               max_by(x, day) AS xn
             |        FROM ax GROUP BY 1),
             |xn1 AS (SELECT a.event_type, max_by(a.x, a.day) AS xn1
             |        FROM ax a JOIN (SELECT event_type, max(day) AS md
             |                        FROM ax GROUP BY 1) m
             |          ON a.event_type = m.event_type AND a.day < m.md
             |        GROUP BY 1),
             |cen AS (SELECT a.event_type, a.day, t.n * a.x - t.s AS c
             |        FROM ax a JOIN tot t ON a.event_type = t.event_type),
             |den AS (SELECT event_type, sum(c * c) AS den
             |        FROM cen GROUP BY 1),
             |nums AS (
             |  SELECT a.event_type,
             |         sum(CASE WHEN b.day = a.day + 1 THEN a.c * b.c
             |           ELSE 0 END) AS num1,
             |         sum(CASE WHEN b.day = a.day + 2 THEN a.c * b.c
             |           ELSE 0 END) AS num2
             |  FROM cen a JOIN cen b ON a.event_type = b.event_type
             |    AND b.day IN (a.day + 1, a.day + 2)
             |  GROUP BY 1),
             |rs AS (
             |  SELECT n.event_type,
             |         CAST(CASE WHEN num1 >= 0
             |           THEN (num1 * 1000000) // greatest(1, den)
             |           ELSE -((-num1 * 1000000) // greatest(1, den))
             |         END AS BIGINT) AS r1,
             |         CAST(CASE WHEN num2 >= 0
             |           THEN (num2 * 1000000) // greatest(1, den)
             |           ELSE -((-num2 * 1000000) // greatest(1, den))
             |         END AS BIGINT) AS r2
             |  FROM nums n JOIN den d ON n.event_type = d.event_type),
             |phi AS (
             |  SELECT event_type, r1, r2,
             |         CASE WHEN r1 * (1000000 - r2) >= 0
             |           THEN r1 * (1000000 - r2) * 1000000
             |                // greatest(1, 1000000000000 - r1 * r1)
             |           ELSE -((-(r1 * (1000000 - r2))) * 1000000
             |                // greatest(1, 1000000000000 - r1 * r1))
             |         END AS phi1_e6,
             |         CASE WHEN r2 * 1000000 - r1 * r1 >= 0
             |           THEN (r2 * 1000000 - r1 * r1) * 1000000
             |                // greatest(1, 1000000000000 - r1 * r1)
             |           ELSE -((-(r2 * 1000000 - r1 * r1)) * 1000000
             |                // greatest(1, 1000000000000 - r1 * r1))
             |         END AS phi2_e6
             |  FROM rs)
             |SELECT p.event_type, p.r1, p.r2, p.phi1_e6, p.phi2_e6,
             |       CAST(t.s * 1000000 // t.n AS BIGINT)
             |       + CASE WHEN p.phi1_e6 * (t.xn * 1000000
             |           - t.s * 1000000 // t.n) >= 0
             |         THEN CAST(p.phi1_e6 * (t.xn * 1000000
             |           - t.s * 1000000 // t.n) // 1000000 AS BIGINT)
             |         ELSE -CAST((-(p.phi1_e6 * (t.xn * 1000000
             |           - t.s * 1000000 // t.n))) // 1000000 AS BIGINT)
             |       END
             |       + CASE WHEN p.phi2_e6 * (x.xn1 * 1000000
             |           - t.s * 1000000 // t.n) >= 0
             |         THEN CAST(p.phi2_e6 * (x.xn1 * 1000000
             |           - t.s * 1000000 // t.n) // 1000000 AS BIGINT)
             |         ELSE -CAST((-(p.phi2_e6 * (x.xn1 * 1000000
             |           - t.s * 1000000 // t.n))) // 1000000 AS BIGINT)
             |       END AS forecast_e6
             |FROM phi p JOIN tot t ON p.event_type = t.event_type
             |JOIN xn1 x ON p.event_type = x.event_type""".stripMargin))
  )
}
