package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-147 batch: the panel-data causal toolkit beyond diff-in-diff —
  * two-way fixed-effects within estimator (entity+time demeaning, the
  * workhorse panel regression), synthetic control (inverse-distance
  * donor weights over a pre-period profile → counterfactual post
  * series → per-month gap), and the standard placebo-rank inference
  * for synthetic control (re-run the construction with every unit as
  * pseudo-treated; the treated unit's post/pre gap-ratio rank IS the
  * permutation p-value). All-integer arithmetic: cents/dollars,
  * e3-scaled cell means, e6 effects with sign-factored truncating
  * division so Spark `div` and DuckDB `//` agree on every row.
  *
  * Scale notes: the panel grain is (supplier, month) — cells grow
  * linearly with data and flow through two hash aggregates plus two
  * broadcastable mean joins; the synthetic-control axes (nation ×
  * month) are FIXED-cardinality dimensions, so the donor cross term
  * is O(nations² · months) regardless of fact-table size — the fact
  * scan aggregates down before any cross join.
  */
object Round147Queries {

  /** Shared SQL: nation × month revenue (cents) over the fixed
    * 1996-01..1997-12 grid, zero-filled. m = 0..23 (months since
    * 1996-01); pre = 0..11, post = 12..23. */
  private val nationMonthSql: String =
    """grid AS (
      |  SELECT n_nationkey AS nk, gs.m
      |  FROM nation CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS m) gs),
      |rev AS (
      |  SELECT s.s_nationkey AS nk,
      |         (year(l.l_shipdate) - 1996) * 12 + month(l.l_shipdate) - 1 AS m,
      |         CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
      |           AS BIGINT) AS c
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE year(l.l_shipdate) IN (1996, 1997)
      |  GROUP BY 1, 2),
      |nm AS (
      |  SELECT g.nk, g.m, COALESCE(r.c, 0) AS c
      |  FROM grid g LEFT JOIN rev r ON r.nk = g.nk AND r.m = g.m)"""
      .stripMargin

  /** Spark twin of [[nationMonthSql]]: nation×month grid, zero-filled. */
  private def nationMonth(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame = {
    val grid = Tables.nation(s, d).select(col("n_nationkey").as("nk"))
      .crossJoin(s.range(0, 24).select(col("id").as("m")))
    val rev = Tables.lineitem(s, d)
      .filter(expr("year(l_shipdate) IN (1996, 1997)"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("nk"),
        expr("(year(l_shipdate) - 1996) * 12 + month(l_shipdate) - 1")
          .as("m"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy(col("nk"), col("m")).agg(sum(col("c")).as("c"))
    grid.join(rev, Seq("nk", "m"), "left")
      .select(col("nk"), col("m"), coalesce(col("c"), lit(0L)).as("c"))
  }

  def defs: Seq[QueryDef] = Seq(

    // ── Two-way fixed-effects within estimator: cells = (supplier,
    //    month) with x = mean quantity (e3) and y = mean line revenue
    //    in dollars (e3); demean by entity mean, time mean, + grand
    //    mean (the within transform); slope via the double-truncating
    //    division den = max(1, Σdx² // 1e6). Identical formula both
    //    engines, so truncation is parity-safe.
    QueryDef("q_panel_fe",
      (s, d) => {
        val c2 = Tables.lineitem(s, d)
          .filter(expr("year(l_shipdate) IN (1996, 1997)"))
          .select(col("l_suppkey").as("sk"),
            expr("(year(l_shipdate) - 1996) * 12 + month(l_shipdate) - 1")
              .as("m"),
            expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"),
            expr("CAST(floor(l_extendedprice) AS BIGINT)").as("r"))
          .groupBy(col("sk"), col("m"))
          .agg(expr("sum(q) * 1000 div count(*)").as("x_e3"),
            expr("sum(r) * 1000 div count(*)").as("y_e3"))
        val ent = c2.groupBy(col("sk"))
          .agg(expr("sum(x_e3) div count(*)").as("mx_i"),
            expr("sum(y_e3) div count(*)").as("my_i"))
        val tim = c2.groupBy(col("m"))
          .agg(expr("sum(x_e3) div count(*)").as("mx_t"),
            expr("sum(y_e3) div count(*)").as("my_t"))
        val g = c2.agg(expr("sum(x_e3) div count(*)").as("mx_g"),
          expr("sum(y_e3) div count(*)").as("my_g"),
          count(lit(1)).as("n_cells"))
        c2.join(broadcast(ent), "sk").join(broadcast(tim), "m")
          .crossJoin(broadcast(g))
          .select(col("n_cells"),
            (col("x_e3") - col("mx_i") - col("mx_t") + col("mx_g"))
              .as("dx"),
            (col("y_e3") - col("my_i") - col("my_t") + col("my_g"))
              .as("dy"))
          .groupBy(col("n_cells"))
          .agg(sum(col("dx") * col("dy")).as("sxy"),
            sum(col("dx") * col("dx")).as("sxx"))
          .selectExpr("CAST(n_cells AS BIGINT) AS n_cells",
            """CASE WHEN sxy >= 0
              |  THEN sxy div greatest(1L, sxx div 1000000)
              |  ELSE -((-sxy) div greatest(1L, sxx div 1000000))
              |END AS slope_e6""".stripMargin)
      },
      Some("""WITH cells AS (
             |  SELECT l_suppkey AS sk,
             |         (year(l_shipdate) - 1996) * 12 + month(l_shipdate) - 1
             |           AS m,
             |         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
             |           * 1000 // count(*) AS BIGINT) AS x_e3,
             |         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT))
             |           * 1000 // count(*) AS BIGINT) AS y_e3
             |  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)
             |  GROUP BY 1, 2),
             |ent AS (SELECT sk,
             |          CAST(sum(x_e3) // count(*) AS BIGINT) AS mx_i,
             |          CAST(sum(y_e3) // count(*) AS BIGINT) AS my_i
             |        FROM cells GROUP BY 1),
             |tim AS (SELECT m,
             |          CAST(sum(x_e3) // count(*) AS BIGINT) AS mx_t,
             |          CAST(sum(y_e3) // count(*) AS BIGINT) AS my_t
             |        FROM cells GROUP BY 1),
             |g AS (SELECT CAST(sum(x_e3) // count(*) AS BIGINT) AS mx_g,
             |             CAST(sum(y_e3) // count(*) AS BIGINT) AS my_g,
             |             CAST(count(*) AS BIGINT) AS n_cells FROM cells),
             |dm AS (SELECT g.n_cells,
             |         c.x_e3 - e.mx_i - t.mx_t + g.mx_g AS dx,
             |         c.y_e3 - e.my_i - t.my_t + g.my_g AS dy
             |       FROM cells c JOIN ent e ON c.sk = e.sk
             |       JOIN tim t ON c.m = t.m CROSS JOIN g),
             |a AS (SELECT n_cells, CAST(sum(dx * dy) AS BIGINT) AS sxy,
             |             CAST(sum(dx * dx) AS BIGINT) AS sxx
             |      FROM dm GROUP BY 1)
             |SELECT n_cells,
             |       CASE WHEN sxy >= 0
             |         THEN sxy // greatest(1, sxx // 1000000)
             |         ELSE -((-sxy) // greatest(1, sxx // 1000000))
             |       END AS slope_e6
             |FROM a""".stripMargin)),

    // ── Synthetic control: treated = nation 0; donors j ≠ 0 weighted
    //    by inverse pre-period (1996) profile distance w_raw = 1e12 //
    //    (1 + Σ|y0 - yj| // 1000) (kilocent quantization keeps
    //    w_raw·1e6 inside Long), normalized to e6; counterfactual post
    //    (1997) series = Σ_j w·yj // 1e6; emit actual, synth, gap per
    //    post month. Donor axis is fixed-cardinality → the cross term
    //    never grows with the fact table.
    QueryDef("q_synth_control",
      (s, d) => {
        val nm = nationMonth(s, d).localCheckpoint(false)
        val pre0 = nm.filter(col("nk") === 0 && col("m") < 12)
          .select(col("m"), col("c").as("y0"))
        val preJ = nm.filter(col("nk") =!= 0 && col("m") < 12)
          .select(col("nk"), col("m"), col("c").as("yj"))
        val w = preJ.join(broadcast(pre0), "m")
          .groupBy(col("nk"))
          .agg(sum(abs(col("yj") - col("y0"))).as("dist"))
          .select(col("nk"),
            expr("1000000000000 div (1 + dist div 1000)").as("w_raw"))
        val wn = w.crossJoin(broadcast(
            w.agg(sum(col("w_raw")).as("sw"))))
          .select(col("nk"), expr("w_raw * 1000000 div sw").as("w_e6"))
        val post0 = nm.filter(col("nk") === 0 && col("m") >= 12)
          .select(col("m"), col("c").as("actual_cents"))
        val postJ = nm.filter(col("nk") =!= 0 && col("m") >= 12)
        val synth = postJ.join(broadcast(wn), "nk")
          .groupBy(col("m"))
          .agg(expr("sum(w_e6 * c) div 1000000").as("synth_cents"))
        post0.join(synth, "m")
          .selectExpr("CAST(m AS BIGINT) AS m", "actual_cents",
            "CAST(synth_cents AS BIGINT) AS synth_cents",
            "actual_cents - synth_cents AS gap_cents")
      },
      Some(s"""WITH $nationMonthSql,
              |pre0 AS (SELECT m, c AS y0 FROM nm WHERE nk = 0 AND m < 12),
              |w AS (SELECT p.nk,
              |        CAST(1000000000000 // (1 + sum(abs(p.c - pre0.y0)) // 1000)
              |          AS BIGINT) AS w_raw
              |      FROM nm p JOIN pre0 ON p.m = pre0.m
              |      WHERE p.nk <> 0 AND p.m < 12 GROUP BY 1),
              |wn AS (SELECT nk, CAST(w_raw * 1000000 //
              |         (SELECT sum(w_raw) FROM w) AS BIGINT) AS w_e6
              |       FROM w),
              |synth AS (SELECT p.m,
              |            CAST(sum(wn.w_e6 * p.c) // 1000000 AS BIGINT)
              |              AS synth_cents
              |          FROM nm p JOIN wn ON p.nk = wn.nk
              |          WHERE p.m >= 12 GROUP BY 1)
              |SELECT CAST(a.m AS BIGINT) AS m, a.c AS actual_cents,
              |       s.synth_cents,
              |       a.c - s.synth_cents AS gap_cents
              |FROM nm a JOIN synth s ON a.m = s.m
              |WHERE a.nk = 0 AND a.m >= 12""".stripMargin)),

    // ── Placebo-rank inference: rebuild the synthetic control with
    //    EVERY nation as pseudo-treated (donors = the other 24); the
    //    post/pre absolute-gap ratio ranks the true treated unit among
    //    placebos — rank/N is the permutation p-value. ratio_e6 =
    //    post_gap·1e6 // (1 + pre_gap).
    QueryDef("q_placebo_gaps",
      (s, d) => {
        val nm = nationMonth(s, d).localCheckpoint(false)
        val pairs = nm.select(col("nk").as("p"), col("m"),
            col("c").as("yp"))
          .join(nm.select(col("nk").as("j"), col("m"), col("c").as("yj")),
            "m")
          .filter(col("p") =!= col("j"))
        // the weight frame is nations² rows — checkpoint once, broadcast
        // into both its normalizer and the counterfactual join
        val w = pairs.filter(col("m") < 12)
          .groupBy(col("p"), col("j"))
          .agg(sum(abs(col("yp") - col("yj"))).as("dist"))
          .select(col("p"), col("j"),
            expr("1000000000000 div (1 + dist div 1000)").as("w_raw"))
          .localCheckpoint(false)
        val wn = w.join(
            broadcast(w.groupBy(col("p")).agg(sum(col("w_raw")).as("sw"))),
            "p")
          .select(col("p"), col("j"),
            expr("w_raw * 1000000 div sw").as("w_e6"))
        val synth = pairs.join(broadcast(wn), Seq("p", "j"))
          .groupBy(col("p"), col("m"))
          .agg(max(col("yp")).as("yp"),
            expr("sum(w_e6 * yj) div 1000000").as("synth"))
        val ratio = synth
          .groupBy(col("p"))
          .agg(sum(when(col("m") >= 12, abs(col("yp") - col("synth")))
            .otherwise(0L)).as("post_gap"),
            sum(when(col("m") < 12, abs(col("yp") - col("synth")))
              .otherwise(0L)).as("pre_gap"))
          .select(col("p").cast("long").as("nationkey"),
            expr("post_gap * 1000000 div (1 + pre_gap)").as("ratio_e6"))
        import org.apache.spark.sql.expressions.Window
        // fixed 25-nation axis → the unpartitioned rank window is
        // bounded by the dimension table, never by fact-table size
        ratio.withColumn("rnk",
            row_number().over(Window.orderBy(col("ratio_e6").desc,
              col("nationkey"))).cast("long"))
          .orderBy(col("rnk"))
      },
      Some(s"""WITH $nationMonthSql,
              |pairs AS (
              |  SELECT a.nk AS p, b.nk AS j, a.m, a.c AS yp, b.c AS yj
              |  FROM nm a JOIN nm b ON a.m = b.m AND a.nk <> b.nk),
              |w AS (SELECT p, j,
              |        CAST(1000000000000 // (1 + sum(abs(yp - yj)) // 1000)
              |          AS BIGINT) AS w_raw
              |      FROM pairs WHERE m < 12 GROUP BY 1, 2),
              |wn AS (SELECT p, j, CAST(w_raw * 1000000 // sw AS BIGINT)
              |         AS w_e6
              |       FROM w JOIN (SELECT p AS p2, sum(w_raw) AS sw
              |                    FROM w GROUP BY 1) t ON w.p = t.p2),
              |synth AS (SELECT pr.p, pr.m, max(pr.yp) AS yp,
              |            CAST(sum(wn.w_e6 * pr.yj) // 1000000 AS BIGINT)
              |              AS synth
              |          FROM pairs pr JOIN wn ON pr.p = wn.p
              |            AND pr.j = wn.j
              |          GROUP BY 1, 2),
              |ratio AS (
              |  SELECT CAST(p AS BIGINT) AS nationkey,
              |         CAST(sum(CASE WHEN m >= 12 THEN abs(yp - synth)
              |             ELSE 0 END) * 1000000 //
              |           (1 + sum(CASE WHEN m < 12 THEN abs(yp - synth)
              |             ELSE 0 END)) AS BIGINT) AS ratio_e6
              |  FROM synth GROUP BY 1)
              |SELECT nationkey, ratio_e6,
              |       CAST(row_number() OVER (ORDER BY ratio_e6 DESC,
              |         nationkey) AS BIGINT) AS rnk
              |FROM ratio ORDER BY rnk""".stripMargin))
  )
}
