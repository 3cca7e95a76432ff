package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-44 batch: banded DTW distance between PAA-reduced daily series
  * (the alignment-tolerant similarity the SAX/ACF family lacked), the
  * TPC-H Q7 international trade-flow matrix, and the Hurst exponent by
  * the aggregated-variance method (long-range dependence — completes
  * burstiness/ACF/seasonal-strength).
  *
  * The DTW recurrence unrolls as straight-line column arithmetic over
  * the 7-frame PAA series (the bounded-horizon pattern of q_holt_linear)
  * — cell expressions are GENERATED once and shared verbatim between the
  * DataFrame chain and the SQL oracle (abs/least/+ parse identically in
  * Spark SQL and DuckDB).
  */
object Round44Queries {

  private val N = 7   // PAA frames
  private val W = 2   // Sakoe–Chiba band half-width

  /** DTW cell expressions in anti-diagonal order: (name, expr). */
  private val dtwCells: Seq[(String, String)] = {
    def valid(i: Int, j: Int) =
      i >= 1 && j >= 1 && i <= N && j <= N && math.abs(i - j) <= W
    for {
      k <- 2 to 2 * N
      i <- 1 to N
      j = k - i
      if valid(i, j)
    } yield {
      val prev = Seq((i - 1, j), (i, j - 1), (i - 1, j - 1))
        .filter { case (a, b) => valid(a, b) }
        .map { case (a, b) => s"d_${a}_$b" }
      val base = s"abs(a$i - b$j)"
      val e =
        if (prev.isEmpty) base
        else if (prev.size == 1) s"$base + ${prev.head}"
        else s"$base + least(${prev.mkString(", ")})"
      (s"d_${i}_$j", e)
    }
  }

  /** PAA pivot per key: 7 frames of 4-day truncated means over the
    * first 28 days (keys with fewer days drop). */
  private def paa(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    daily.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 28)
      .groupBy(col("k"), expr("(rn - 1) div 4").as("f"))
      .agg(expr("sum(c) div 4").as("pa"), count(lit(1)).as("nf"))
      .groupBy(col("k"))
      .agg(sum(col("nf")).as("nd"), (0 until N).map(f =>
        min(when(col("f") === f, col("pa"))).as(s"p${f + 1}")): _*)
      .filter(col("nd") === 28)
  }

  private val paaSql =
    s"""(WITH daily AS (
       |  SELECT event_type AS k, epoch_us(ts) // 86400000000 AS day,
       |         count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |r AS (SELECT k, c, row_number() OVER (PARTITION BY k ORDER BY day)
       |        AS rn FROM daily),
       |fr AS (SELECT k, (rn - 1) // 4 AS f, sum(c) // 4 AS pa,
       |              count(*) AS nf
       |       FROM r WHERE rn <= 28 GROUP BY 1, 2)
       |SELECT k, ${(0 until N).map(f =>
           s"min(CASE WHEN f = $f THEN pa END) AS p${f + 1}").mkString(", ")}
       |FROM fr GROUP BY k HAVING sum(nf) = 28)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── Banded DTW (|i−j| ≤ 2) between every pair of event types'
    //    PAA-reduced daily series, with the aligned L1 distance for
    //    contrast (DTW ≤ L1 by construction — the slack is what
    //    alignment buys).
    QueryDef("q_dtw_paa",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type").as("k"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val p = paa(daily).localCheckpoint(false)
        val a = p.select(col("k").as("ka") +:
          (1 to N).map(i => col(s"p$i").as(s"a$i")): _*)
        val b = p.select(col("k").as("kb") +:
          (1 to N).map(i => col(s"p$i").as(s"b$i")): _*)
        val pairs = a.crossJoin(broadcast(b)).filter(col("ka") < col("kb"))
        val stepped = dtwCells.foldLeft(pairs) { case (acc, (nm, e)) =>
          acc.withColumn(nm, expr(e))
        }
        stepped.select(col("ka"), col("kb"),
          col(s"d_${N}_$N").as("dtw"),
          expr((1 to N).map(i => s"abs(a$i - b$i)").mkString(" + "))
            .as("l1_aligned"))
      },
      Some {
        val steps = dtwCells.grouped(8).zipWithIndex.map { case (cs, gi) =>
          val from = if (gi == 0) "pairs" else s"s${gi - 1}"
          s"s$gi AS (SELECT *, ${cs.map { case (nm, e) => s"$e AS $nm" }
            .mkString(",\n  ")} FROM $from)"
        }.toSeq
        s"""WITH p AS MATERIALIZED (SELECT * FROM $paaSql t),
           |pairs AS (
           |  SELECT a.k AS ka, b.k AS kb,
           |         ${(1 to N).map(i => s"a.p$i AS a$i").mkString(", ")},
           |         ${(1 to N).map(i => s"b.p$i AS b$i").mkString(", ")}
           |  FROM p a JOIN p b ON a.k < b.k),
           |${steps.mkString(",\n")}
           |SELECT ka, kb, CAST(d_${N}_$N AS BIGINT) AS dtw,
           |       CAST(${(1 to N).map(i => s"abs(a$i - b$i)")
             .mkString(" + ")} AS BIGINT) AS l1_aligned
           |FROM s${steps.size - 1}""".stripMargin
      }),

    // ── TPC-H Q7 shape: revenue flowing supplier-nation → customer-
    //    nation for cross-nation 1996–97 shipments, by year. ONE
    //    big li⋈orders shuffle; supplier, customer and nation are
    //    broadcast dims.
    QueryDef("q_tpch_trade_flows",
      (s, d) => {
        def centsCol(c: String) = floor(col(c) * 100 + 0.5).cast("long")
        val li = Tables.lineitem(s, d)
          .filter(year(col("l_shipdate")).between(1996, 1997))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).cast("long").as("l_year"),
            (centsCol("l_extendedprice") *
              (lit(100L) - centsCol("l_discount"))).as("rev_cp"))
        val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val n = Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))
        val sup = Tables.supplier(s, d)
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cust = Tables.customer(s, d)
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(sum(col("rev_cp")).as("rev_cp"), count(lit(1)).as("n_items"))
      },
      Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |                     AS BIGINT)
             |                * (100 - CAST(floor(l_discount * 100 + 0.5)
             |                              AS BIGINT))) AS BIGINT) AS rev_cp,
             |       CAST(count(*) AS BIGINT) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation sn ON s_nationkey = sn.n_nationkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation cn ON c_nationkey = cn.n_nationkey
             |WHERE year(l_shipdate) BETWEEN 1996 AND 1997
             |  AND sn.n_name <> cn.n_name
             |GROUP BY 1, 2, 3""".stripMargin)),

    // ── Hurst exponent by aggregated variance: block-mean variances at
    //    scales m ∈ {1, 2, 4, 7} over the first 28 days, log-log slope
    //    on the shared fixed-point log₂ (var(m) ~ m^{2H−2} ⇒
    //    H = (slope + 2)/2) — all integer.
    QueryDef("q_hurst",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("k")).orderBy(col("day"))
        val daily = Tables.events(s, d)
          .groupBy(col("event_type").as("k"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 28)
        val scales = daily
          .select(col("k"), col("rn"), col("c"),
            explode(expr("array(1, 2, 4, 7)")).as("m"))
          .groupBy(col("k"), col("m"), expr("(rn - 1) div m").as("blk"))
          .agg(expr("sum(c) div m").as("bm"))
          .groupBy(col("k"), col("m"))
          .agg(count(lit(1)).as("nb"), sum(col("bm")).as("sb"),
            sum(col("bm") * col("bm")).as("qb"))
          .filter(expr("nb * qb - sb * sb > 0"))
          // e3 log units (div 1000, sign-factored for y) keep the
          // least-squares moments and the ·1e6 slope numerator inside
          // 64 bits — e6 logs overflow at (n·sxy − sx·sy)·1e6.
          .select(col("k"), col("m"), col("nb"),
            Bm25.log2E6(col("m").cast("long")).as("x0"),
            (Bm25.log2E6(expr("nb * qb - sb * sb")) -
              Bm25.log2E6(col("nb")) * 2).as("y0"))
          .withColumn("x", expr("x0 div 1000"))
          .withColumn("y",
            expr("CASE WHEN y0 >= 0 THEN y0 div 1000 "
              + "ELSE -((-y0) div 1000) END"))
        scales.groupBy(col("k"))
          .agg(count(lit(1)).as("n_scales"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .select(col("k"), col("n_scales"),
            expr("""CASE WHEN n_scales * sxy - sx * sy >= 0
                   |THEN (n_scales * sxy - sx * sy) * 1000000
                   |     div (n_scales * sxx - sx * sx)
                   |ELSE -((sx * sy - n_scales * sxy) * 1000000
                   |       div (n_scales * sxx - sx * sx))
                   |END""".stripMargin).as("slope_e6"))
          .withColumn("hurst_e6",
            expr("""CASE WHEN slope_e6 + 2000000 >= 0
                   |THEN (slope_e6 + 2000000) div 2
                   |ELSE -((-(slope_e6 + 2000000)) div 2) END""".stripMargin))
      },
      Some {
        val lgM = Bm25.log2E6Sql("CAST(m AS BIGINT)")
        val lgV = Bm25.log2E6Sql("CAST(nb * qb - sb * sb AS BIGINT)")
        val lgN = Bm25.log2E6Sql("CAST(nb AS BIGINT)")
        s"""WITH daily AS (
           |  SELECT event_type AS k, epoch_us(ts) // 86400000000 AS day,
           |         count(*) AS c
           |  FROM events GROUP BY 1, 2),
           |r AS (SELECT k, c, row_number() OVER (PARTITION BY k
           |        ORDER BY day) AS rn FROM daily),
           |blk AS (
           |  SELECT k, m, (rn - 1) // m AS blk, sum(c) // m AS bm
           |  FROM r CROSS JOIN (SELECT unnest([1, 2, 4, 7]) AS m) ms
           |  WHERE rn <= 28 GROUP BY 1, 2, 3),
           |v AS (
           |  SELECT k, m, count(*) AS nb, sum(bm) AS sb,
           |         sum(bm * bm) AS qb
           |  FROM blk GROUP BY 1, 2),
           |xy0 AS (
           |  SELECT k, m, nb, $lgM AS x0, $lgV - $lgN * 2 AS y0
           |  FROM v WHERE nb * qb - sb * sb > 0),
           |xy AS (
           |  SELECT k, x0 // 1000 AS x,
           |         CASE WHEN y0 >= 0 THEN y0 // 1000
           |              ELSE -((-y0) // 1000) END AS y
           |  FROM xy0),
           |ls AS (
           |  SELECT k, count(*) AS n_scales, sum(x) AS sx, sum(y) AS sy,
           |         sum(x * x) AS sxx, sum(x * y) AS sxy
           |  FROM xy GROUP BY 1),
           |sl AS (
           |  SELECT k, CAST(n_scales AS BIGINT) AS n_scales,
           |         CAST(CASE WHEN n_scales * sxy - sx * sy >= 0
           |              THEN (n_scales * sxy - sx * sy) * 1000000
           |                   // (n_scales * sxx - sx * sx)
           |              ELSE -((sx * sy - n_scales * sxy) * 1000000
           |                     // (n_scales * sxx - sx * sx))
           |              END AS BIGINT) AS slope_e6
           |  FROM ls)
           |SELECT k, n_scales, slope_e6,
           |       CAST(CASE WHEN slope_e6 + 2000000 >= 0
           |            THEN (slope_e6 + 2000000) // 2
           |            ELSE -((-(slope_e6 + 2000000)) // 2) END AS BIGINT)
           |         AS hurst_e6
           |FROM sl""".stripMargin
      })
  )
}
