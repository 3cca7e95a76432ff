package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.functions._

/** Round-153 batch: risk-modeling trio —
  *
  *  - Weight-of-evidence / information value (`q_woe_iv`): the
  *    credit-scorecard feature audit. Buckets are FIXED log₂ spend
  *    bands (not deciles — a global ntile would funnel every customer
  *    through one sort partition; log bands bucket in a map-side
  *    expression and the axis stays ≤ ~40 rows at any scale). WOE and
  *    IV use the shared integer log₂ machinery with +1/+B Laplace
  *    smoothing so empty cells stay defined.
  *  - Two-hop reach (`q_two_hop_reach`): audience estimation — for
  *    each node, how many distinct nodes sit exactly two hops away
  *    (friends-of-friends minus self and direct neighbors). Wedge
  *    join + distinct + anti-join; candidates are bounded by
  *    neighborhood products, never all-pairs.
  *  - VaR breach backtest (`q_var_backtest`): fit p95 daily-revenue
  *    VaR on the first half of the day axis (exact nearest-rank),
  *    count tail breaches on the held-out half, and score the
  *    proportion-of-failures z statistic — the Kupiec-style model
  *    validation every risk pipeline runs. One floor(sqrt(double)) in
  *    fixed evaluation order (the repo's deterministic-double
  *    convention, as in q_grubbs).
  */
object Round153Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── WOE/IV: feature = log₂ band of 1996 spend; outcome good =
    //    ordered again in 1997. woe = log2e6(g·TB) − log2e6(b·TG)
    //    with per-cell +1 (and +B on totals) smoothing; iv_term =
    //    (g%−b%)·woe, sign-factored e6.
    QueryDef("q_woe_iv",
      (s, d) => {
        val cu = Tables.orders(s, d)
          .filter(expr("year(o_orderdate) IN (1996, 1997)"))
          .groupBy(col("o_custkey"))
          .agg(sum(when(expr("year(o_orderdate) = 1996"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .otherwise(0L)).as("spend96"),
            max(when(expr("year(o_orderdate) = 1997"), 1L).otherwise(0L))
              .as("good"))
          .filter(col("spend96") > 0L)
          .select(Bm25.log2E6(col("spend96")).as("l"), col("good"))
          .selectExpr("l div 1000000 AS bucket", "good")
        val cells = cu.groupBy(col("bucket"))
          .agg(sum(col("good")).as("g"),
            sum(lit(1L) - col("good")).as("b"))
        val tot = cells.agg(sum(col("g")).as("tg"), sum(col("b")).as("tb"),
          count(lit(1)).as("nb"))
        cells.crossJoin(broadcast(tot))
          .selectExpr("CAST(bucket AS BIGINT) AS bucket",
            "CAST(g AS BIGINT) AS n_good", "CAST(b AS BIGINT) AS n_bad",
            "(g + 1) * 1000000 div (tg + nb) AS gp_e6",
            "(b + 1) * 1000000 div (tb + nb) AS bp_e6")
          .withColumn("woe_e6",
            Bm25.log2E6(col("gp_e6")) - Bm25.log2E6(col("bp_e6")))
          .selectExpr("bucket", "n_good", "n_bad", "woe_e6",
            """CASE WHEN (gp_e6 - bp_e6) * woe_e6 >= 0
              |  THEN abs(gp_e6 - bp_e6) * abs(woe_e6) div 1000000
              |  ELSE -(abs(gp_e6 - bp_e6) * abs(woe_e6) div 1000000)
              |END AS iv_term_e6""".stripMargin)
      },
      Some {
        val logBucket = Bm25.log2E6Sql("spend96")
        val woe = Bm25.log2E6Sql("gp_e6") + " - " + Bm25.log2E6Sql("bp_e6")
        s"""WITH cu AS (
           |  SELECT o_custkey,
           |         CAST(sum(CASE WHEN year(o_orderdate) = 1996
           |           THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
           |           ELSE 0 END) AS BIGINT) AS spend96,
           |         max(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0
           |           END) AS good
           |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
           |  GROUP BY 1),
           |bu AS (SELECT ($logBucket) // 1000000 AS bucket, good
           |       FROM cu WHERE spend96 > 0),
           |cells AS (SELECT bucket, CAST(sum(good) AS BIGINT) AS g,
           |                 CAST(sum(1 - good) AS BIGINT) AS b
           |          FROM bu GROUP BY 1),
           |tot AS (SELECT CAST(sum(g) AS BIGINT) AS tg,
           |               CAST(sum(b) AS BIGINT) AS tb,
           |               CAST(count(*) AS BIGINT) AS nb FROM cells),
           |p AS (SELECT bucket, g AS n_good, b AS n_bad,
           |        (g + 1) * 1000000 // (tg + nb) AS gp_e6,
           |        (b + 1) * 1000000 // (tb + nb) AS bp_e6
           |      FROM cells CROSS JOIN tot),
           |w AS (SELECT bucket, n_good, n_bad, gp_e6, bp_e6,
           |        CAST($woe AS BIGINT) AS woe_e6 FROM p)
           |SELECT bucket, n_good, n_bad, woe_e6,
           |       CASE WHEN (gp_e6 - bp_e6) * woe_e6 >= 0
           |         THEN abs(gp_e6 - bp_e6) * abs(woe_e6) // 1000000
           |         ELSE -(abs(gp_e6 - bp_e6) * abs(woe_e6) // 1000000)
           |       END AS iv_term_e6
           |FROM w""".stripMargin
      }),

    // ── Two-hop reach on the 100-node circulant graph: wedge join on
    //    the symmetric adjacency, drop self and direct neighbors,
    //    count distinct endpoints per source.
    QueryDef("q_two_hop_reach",
      (s, d) => {
        val nodes = Tables.part(s, d)
          .select((col("p_partkey") % 100).as("id")).distinct()
        val dir = nodes.select(col("id").as("src"),
            ((col("id") + 1) % 100).as("dst"))
          .unionByName(nodes.filter(col("id") % 2 === 0)
            .select(col("id").as("src"),
              ((col("id") * 7 + 3) % 100).as("dst")))
        val adj = dir.select(col("src"), col("dst"))
          .unionByName(dir.select(col("dst").as("src"),
            col("src").as("dst")))
          .distinct().localCheckpoint(false)
        val deg = adj.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val two = adj.select(col("src").as("a"), col("dst").as("b"))
          .join(adj.select(col("src").as("b"), col("dst").as("c")), "b")
          .filter(col("c") =!= col("a"))
          .select(col("a"), col("c")).distinct()
          .join(adj.select(col("src").as("a"), col("dst").as("c")),
            Seq("a", "c"), "left_anti")
          .groupBy(col("a")).agg(count(lit(1)).as("reach2"))
        deg.join(two, deg("src") === two("a"), "left")
          .select(col("src").cast("long").as("id"),
            col("deg").cast("long").as("deg"),
            coalesce(col("reach2"), lit(0L)).cast("long").as("reach2"))
      },
      Some("""WITH nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
             |dir AS (SELECT id AS src, (id + 1) % 100 AS dst FROM nodes
             |        UNION ALL
             |        SELECT id AS src, (id * 7 + 3) % 100 AS dst
             |        FROM nodes WHERE id % 2 = 0),
             |adj AS (SELECT DISTINCT src, dst FROM (
             |          SELECT src, dst FROM dir
             |          UNION ALL SELECT dst AS src, src AS dst FROM dir)),
             |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
             |        FROM adj GROUP BY 1),
             |two AS (SELECT DISTINCT x.src AS a, y.dst AS c
             |        FROM adj x JOIN adj y ON x.dst = y.src
             |        WHERE y.dst <> x.src),
             |nn AS (SELECT t.a, t.c FROM two t
             |       LEFT JOIN adj ON adj.src = t.a AND adj.dst = t.c
             |       WHERE adj.src IS NULL),
             |r AS (SELECT a, CAST(count(*) AS BIGINT) AS reach2
             |      FROM nn GROUP BY 1)
             |SELECT CAST(d.src AS BIGINT) AS id, d.deg,
             |       CAST(coalesce(r.reach2, 0) AS BIGINT) AS reach2
             |FROM deg d LEFT JOIN r ON d.src = r.a""".stripMargin)),

    // ── VaR backtest: p95 of daily revenue cents fitted on the first
    //    half of the day axis (exact nearest-rank), breaches counted
    //    on the second half; Kupiec-style z = (x − np) / √(np(1−p))
    //    with one floor(sqrt(double)) in fixed order.
    QueryDef("q_var_backtest",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
          .groupBy(col("day")).agg(sum(col("c")).as("dc"))
          .localCheckpoint(false) // bounded day axis: windows ride this
        val mid = daily.agg(
          expr("(min(day) + max(day) + 1) div 2").as("mid"))
        val tagged = daily.crossJoin(broadcast(mid))
        val train = tagged.filter(col("day") < col("mid"))
        val vr = train
          .withColumn("rk", row_number().over(
            Window.orderBy(col("dc"), col("day"))))
          .crossJoin(broadcast(train.agg(count(lit(1)).as("ntr"))))
          .filter(col("rk") === expr("(95 * ntr + 99) div 100"))
          .select(col("dc").as("var95"), col("ntr"))
        tagged.filter(col("day") >= col("mid"))
          .crossJoin(broadcast(vr))
          .agg(max(col("ntr")).as("n_train"),
            count(lit(1)).as("n_test"),
            max(col("var95")).as("var95_cents"),
            sum(when(col("dc") > col("var95"), 1L).otherwise(0L))
              .as("x"))
          .selectExpr("CAST(n_train AS BIGINT) AS n_train",
            "CAST(n_test AS BIGINT) AS n_test", "var95_cents",
            "CAST(x AS BIGINT) AS n_breaches",
            "x * 1000000 div n_test AS breach_rate_e6",
            """CASE WHEN x * 1000000 - n_test * 50000 >= 0
              |  THEN (x * 1000000 - n_test * 50000) div greatest(1L,
              |    CAST(floor(sqrt(CAST(n_test * 50000 * 950000
              |      div 1000000 AS DOUBLE))) AS BIGINT))
              |  ELSE -((n_test * 50000 - x * 1000000) div greatest(1L,
              |    CAST(floor(sqrt(CAST(n_test * 50000 * 950000
              |      div 1000000 AS DOUBLE))) AS BIGINT)))
              |END AS z_e3""".stripMargin)
      },
      Some("""WITH daily AS (
             |  SELECT epoch_us(ts) // 86400000000 AS day,
             |         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
             |           AS BIGINT) AS dc
             |  FROM events GROUP BY 1),
             |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid
             |        FROM daily),
             |train AS (SELECT d.day, d.dc FROM daily d CROSS JOIN mid
             |          WHERE d.day < mid.mid),
             |ntr AS (SELECT CAST(count(*) AS BIGINT) AS ntr FROM train),
             |vr AS (SELECT t.dc AS var95, ntr.ntr
             |       FROM (SELECT day, dc, row_number() OVER (
             |               ORDER BY dc, day) AS rk FROM train) t
             |       CROSS JOIN ntr
             |       WHERE t.rk = (95 * ntr.ntr + 99) // 100),
             |test AS (SELECT d.dc FROM daily d CROSS JOIN mid
             |         WHERE d.day >= mid.mid),
             |a AS (SELECT max(vr.ntr) AS n_train,
             |        CAST(count(*) AS BIGINT) AS n_test,
             |        max(vr.var95) AS var95_cents,
             |        CAST(sum(CASE WHEN test.dc > vr.var95 THEN 1 ELSE 0
             |          END) AS BIGINT) AS x
             |      FROM test CROSS JOIN vr)
             |SELECT n_train, n_test, var95_cents, x AS n_breaches,
             |       x * 1000000 // n_test AS breach_rate_e6,
             |       CASE WHEN x * 1000000 - n_test * 50000 >= 0
             |         THEN (x * 1000000 - n_test * 50000) // greatest(1,
             |           CAST(floor(sqrt(CAST(n_test * 50000 * 950000
             |             // 1000000 AS DOUBLE))) AS BIGINT))
             |         ELSE -((n_test * 50000 - x * 1000000) // greatest(1,
             |           CAST(floor(sqrt(CAST(n_test * 50000 * 950000
             |             // 1000000 AS DOUBLE))) AS BIGINT)))
             |       END AS z_e3
             |FROM a""".stripMargin))
  )
}
