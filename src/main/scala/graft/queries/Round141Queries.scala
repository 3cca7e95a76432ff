package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-141 batch: nonlinear time-series dependence — auto mutual
  * information at lags 1/7/14 (quartile-binned daily volumes; catches
  * dependence q_acf's linear correlation misses), recurrence
  * quantification (recurrence rate + determinism over the bounded
  * day-pair grid — the RQA read on regime stability), and co-supplier
  * reach (2-hop neighborhood size through shared parts on the
  * DATA-SIZED bipartite graph — the supply-network exposure number).
  * Quartile cutoffs come from rank selection on the post-aggregate
  * day axis; MI logs are fixed-point integer log₂.
  */
object Round141Queries {

  /** Daily order volumes with quartile bin (1..4) — rank-selected
    * cutoffs on the bounded day axis, deterministic ties by (c, day). */
  private def binned(s: org.apache.spark.sql.SparkSession, d: String) = {
    val daily = Tables.orders(s, d)
      .groupBy(expr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .as("day"))
      .agg(count(lit(1)).as("c"))
    daily
      .withColumn("rk", row_number().over(
        Window.orderBy(col("c"), col("day"))).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("bin", expr(
        "least((rk - 1) * 4 div n + 1, 4)"))
      .select(col("day"), col("c"), col("bin"))
  }

  private val binnedSql =
    """binned AS (
      |  SELECT day, c, least((rk - 1) * 4 // n + 1, 4) AS bin
      |  FROM (SELECT day, c,
      |               CAST(row_number() OVER (ORDER BY c, day)
      |                 AS BIGINT) AS rk,
      |               CAST(count(*) OVER () AS BIGINT) AS n
      |        FROM (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
      |                     CAST(count(*) AS BIGINT) AS c
      |              FROM orders GROUP BY 1)))""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── Auto mutual information: I(bin_t; bin_{t+k}) for k ∈ {1,7,14}
    //    over consecutive-day pairs, MI = Σ p_xy·log2(p_xy·n²/(n_x·n_y))
    //    in e6 bits — all integer (joint counts × log₂ e6, sign-
    //    factored). The 4×4 joint grid is bounded.
    QueryDef("q_auto_mutual_info",
      (s, d) => {
        val dec = "decimal(38,0)"
        val b = binned(s, d).localCheckpoint(false) // 3 lag self-joins
        val lags = s.range(0, 3)
          .select(expr("CAST(CASE id WHEN 0 THEN 1 WHEN 1 THEN 7 " +
            "ELSE 14 END AS BIGINT)").as("lag"))
        val pairs = b.as("a").crossJoin(broadcast(lags))
          .join(b.as("f"), col("f.day") === col("a.day") + col("lag"))
          .groupBy(col("lag"), col("a.bin").as("bx"),
            col("f.bin").as("by"))
          .agg(count(lit(1)).as("nxy"))
          .localCheckpoint(false) // margins re-aggregate from it
        val mx = pairs.groupBy(col("lag"), col("bx"))
          .agg(sum(col("nxy")).as("nx"))
        val my = pairs.groupBy(col("lag"), col("by"))
          .agg(sum(col("nxy")).as("ny"))
        val nt = pairs.groupBy(col("lag")).agg(sum(col("nxy")).as("n"))
        pairs.join(broadcast(mx), Seq("lag", "bx"))
          .join(broadcast(my), Seq("lag", "by"))
          .join(broadcast(nt), Seq("lag"))
          // log2(nxy·n/(nx·ny)) e6, sign factored via the two products
          .withColumn("lg", Bm25.log2E6(expr("nxy * n")) -
            Bm25.log2E6(expr("nx * ny")))
          .groupBy(col("lag"))
          .agg(max(col("n")).as("n_pairs"),
            sum(expr(s"CAST(nxy AS $dec) * lg")).as("num"))
          .selectExpr("lag", "CAST(n_pairs AS BIGINT) AS n_pairs",
            s"""CAST(CASE WHEN num >= 0
               |  THEN num div CAST(n_pairs AS $dec)
               |  ELSE -((-num) div CAST(n_pairs AS $dec))
               |END AS BIGINT) AS ami_e6""".stripMargin)
      },
      Some(s"""WITH $binnedSql,
             |lags AS (SELECT unnest([1, 7, 14]) AS lag),
             |pairs AS (SELECT lag, a.bin AS bx, f.bin AS by,
             |                 CAST(count(*) AS BIGINT) AS nxy
             |          FROM binned a CROSS JOIN lags
             |          JOIN binned f ON f.day = a.day + lag
             |          GROUP BY 1, 2, 3),
             |mx AS (SELECT lag, bx, CAST(sum(nxy) AS BIGINT) AS nx
             |       FROM pairs GROUP BY 1, 2),
             |my AS (SELECT lag, by, CAST(sum(nxy) AS BIGINT) AS ny
             |       FROM pairs GROUP BY 1, 2),
             |nt AS (SELECT lag, CAST(sum(nxy) AS BIGINT) AS n
             |       FROM pairs GROUP BY 1),
             |t AS (SELECT p.lag, p.nxy,
             |             ${Bm25.log2E6Sql("p.nxy * nt.n")}
             |               - ${Bm25.log2E6Sql("mx.nx * my.ny")} AS lg,
             |             nt.n
             |      FROM pairs p
             |      JOIN mx ON mx.lag = p.lag AND mx.bx = p.bx
             |      JOIN my ON my.lag = p.lag AND my.by = p.by
             |      JOIN nt ON nt.lag = p.lag),
             |agg AS (SELECT lag, max(n) AS n_pairs,
             |               sum(CAST(nxy AS HUGEINT) * lg) AS num
             |        FROM t GROUP BY 1)
             |SELECT CAST(lag AS BIGINT) AS lag,
             |       CAST(n_pairs AS BIGINT) AS n_pairs,
             |       CAST(CASE WHEN num >= 0
             |         THEN num // CAST(n_pairs AS HUGEINT)
             |         ELSE -((-num) // CAST(n_pairs AS HUGEINT))
             |       END AS BIGINT) AS ami_e6
             |FROM agg""".stripMargin)),

    // ── Recurrence quantification on the last 120 days: recurrence
    //    R(i,j) ⟺ |c_i − c_j| ≤ ε (ε = 5% of the window mean, integer
    //    cross-multiplied), i<j within lag ≤ 30. RR = recurrent share;
    //    DET = share of recurrences whose diagonal predecessor also
    //    recurs. The pair grid is day×day — calendar-bounded.
    QueryDef("q_recurrence_quant",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
            .as("day"))
          .agg(count(lit(1)).as("c"))
        val win = daily
          .withColumn("mxd", max(col("day")).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .filter(col("day") > col("mxd") - 120)
          .select(col("day"), col("c"))
          .localCheckpoint(false) // mean + both sides of the pair grid
        val m = win.agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
        val rec = win.as("a").join(win.as("b"),
            col("b.day") > col("a.day") &&
              col("b.day") <= col("a.day") + 30)
          .crossJoin(broadcast(m))
          // |c_i − c_j|·20·n ≤ Σc  ⟺  |Δ| ≤ 0.05·mean
          .select(col("a.day").as("di"), col("b.day").as("dj"),
            (abs(col("a.c") - col("b.c")) * 20 * col("n") <= col("sc"))
              .as("r"))
          .localCheckpoint(false) // diagonal join below
        val det = rec.as("x").join(rec.as("y"),
            col("y.di") === col("x.di") - 1 &&
              col("y.dj") === col("x.dj") - 1, "left")
          .select(col("x.r").as("r"),
            (col("x.r") && coalesce(col("y.r"), lit(false))).as("diag"))
        det.agg(count(lit(1)).as("n_pairs"),
            sum(when(col("r"), 1L).otherwise(0L)).as("n_rec"),
            sum(when(col("diag"), 1L).otherwise(0L)).as("n_diag"))
          .selectExpr("CAST(n_pairs AS BIGINT) AS n_pairs",
            "CAST(n_rec AS BIGINT) AS n_rec",
            "n_rec * 1000000 div n_pairs AS rr_e6",
            """CASE WHEN n_rec = 0 THEN 0
              |ELSE n_diag * 1000000 div n_rec END AS det_e6"""
              .stripMargin)
      },
      Some("""WITH daily AS (
             |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |win AS (SELECT day, c FROM
             |          (SELECT day, c, max(day) OVER () AS mxd
             |           FROM daily)
             |        WHERE day > mxd - 120),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(c) AS BIGINT) AS sc FROM win),
             |rec AS (SELECT a.day AS di, b.day AS dj,
             |               abs(a.c - b.c) * 20 * m.n <= m.sc AS r
             |        FROM win a JOIN win b ON b.day > a.day
             |          AND b.day <= a.day + 30
             |        CROSS JOIN m),
             |det AS (SELECT x.r,
             |               (x.r AND coalesce(y.r, false)) AS diag
             |        FROM rec x LEFT JOIN rec y
             |          ON y.di = x.di - 1 AND y.dj = x.dj - 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             |       CAST(sum(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_rec,
             |       CAST(sum(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT)
             |         * 1000000 // count(*) AS rr_e6,
             |       CASE WHEN sum(CASE WHEN r THEN 1 ELSE 0 END) = 0
             |         THEN 0
             |         ELSE CAST(sum(CASE WHEN diag THEN 1 ELSE 0 END)
             |           AS BIGINT) * 1000000
             |           // CAST(sum(CASE WHEN r THEN 1 ELSE 0 END)
             |                AS BIGINT) END AS det_e6
             |FROM det""".stripMargin)),

    // ── Co-supplier reach: suppliers reachable in 2 hops through
    //    shared parts — distinct co-suppliers per supplier off the
    //    part-keyed self-join of the distinct bipartite edge list
    //    (never an all-pairs supplier scan), top 10 + population mean.
    QueryDef("q_cosupplier_reach",
      (s, d) => {
        val sp = Tables.lineitem(s, d)
          .select(col("l_suppkey").as("sp"), col("l_partkey").as("pt"))
          .distinct()
          .localCheckpoint(false) // both sides of the part-keyed join
        // r12 (guide §2.3 "aggregate before you shuffle"): countDistinct
        // replaces distinct()+count — the (sp, co) dedup then happens in
        // the PARTIAL aggregate on the map side of one exchange instead
        // of shuffling the raw ~Σ(suppliers-per-part)² pair stream
        // through a separate distinct exchange first. Same n_co values.
        val reach = sp.as("a").join(sp.as("b"),
            col("a.pt") === col("b.pt") && col("a.sp") =!= col("b.sp"))
          .select(col("a.sp").as("sp"), col("b.sp").as("co"))
          .groupBy(col("sp")).agg(countDistinct(col("co")).as("n_co"))
          .localCheckpoint(false) // mean + top-10 rank
        val tot = reach.agg(count(lit(1)).as("ns"), sum(col("n_co")).as("sc"))
        // top-10 via TakeOrdered — the supplier axis is dimension-sized
        // (grows with SF), so the rank window runs only on the limited
        // 10-row frame, never a global single-partition sort.
        val top = reach.orderBy(col("n_co").desc, col("sp")).limit(10)
        top.crossJoin(broadcast(tot))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("n_co").desc, col("sp"))))
          .selectExpr("sp AS suppkey", "CAST(n_co AS BIGINT) AS n_co",
            "sc div ns AS mean_reach", "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH sp AS (SELECT DISTINCT l_suppkey AS sp,
             |                   l_partkey AS pt
             |            FROM lineitem),
             |reach AS (SELECT sp, CAST(count(*) AS BIGINT) AS n_co
             |          FROM (SELECT DISTINCT a.sp, b.sp AS co
             |                FROM sp a JOIN sp b
             |                  ON a.pt = b.pt AND a.sp <> b.sp)
             |          GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS ns,
             |               CAST(sum(n_co) AS BIGINT) AS sc FROM reach)
             |SELECT sp AS suppkey, n_co, sc // ns AS mean_reach, rk
             |FROM (SELECT sp, n_co, ns, sc,
             |             CAST(row_number() OVER (ORDER BY n_co DESC,
             |               sp) AS BIGINT) AS rk
             |      FROM reach CROSS JOIN tot)
             |WHERE rk <= 10""".stripMargin))
  )
}
