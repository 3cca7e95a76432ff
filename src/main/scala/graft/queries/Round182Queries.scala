package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-182 batch — rank-based two/k-sample tests on the value axis,
  * bounded-axis changepoint/trend tests, and survey-sampling audits:
  *
  *  - Cliff's delta (`q_cliff_delta`): ordinal effect size
  *    (#(x>y) − #(x<y))/(m·n) between returned and kept line
  *    quantities. Pair counts come from the ≤50-value quantity axis
  *    (Σ ca·cum_b), never row pairs — the value-axis trick every rank
  *    test here uses. The e6 division goes through an explicit
  *    sign-split CASE so negative-numerator rounding is pinned by
  *    construction (both engines truncate toward zero today; the CASE
  *    makes that an invariant of the query, not of the engines).
  *  - Kuiper V (`q_kuiper_orders`): D⁺ + D⁻ between the urgent/relaxed order
  *    value CDFs on the thousand-dollar bucket axis — the
  *    rotation-invariant cousin of q_ks_test, sensitive to tails.
  *  - Brunner–Munzel (`q_brunner_munzel`): the heteroscedastic rank
  *    Welch test. DOUBLED midranks keep ties exact integers; the
  *    placement identity 2P_A(v) = 2·cum_b(<v) + c_b(v) turns per-row
  *    placements into value-axis sums, so S_k² needs only Σc·P and
  *    Σc·P² per group. One closing double chain (round 6).
  *  - k-sample Anderson–Darling (`q_ad_ksample`): Σ_i (1/n_i)
  *    Σ_j (N·M_ij − n_i·B_j)²/(B_j(N−B_j)) over the bucket axis with
  *    per-term e6 integer truncation (mirrored), so the cross-engine
  *    sum is an integer sum — no double accumulation anywhere.
  *  - Cox–Stuart (`q_cox_stuart`): sign trend test pairing month t
  *    with t+n/2 on the monthly revenue axis.
  *  - Pettitt (`q_pettitt_revenue`): nonparametric changepoint via
  *    U_t = Σ_{s≤t} V_s, V_t = Σ_j sgn(x_t − x_j) — the month×month
  *    pair join is bounded by the calendar axis, and the recursion
  *    turns the quadratic-per-t definition into one cumsum.
  *  - Horvitz–Thompson audit (`q_ht_estimate`): deterministic 1/16
  *    hash sample of orders, HT-inflated total vs the true total —
  *    the estimator-bias audit a sampling pipeline ships with.
  *  - Neyman allocation (`q_neyman_alloc`): optimal stratified sample
  *    allocation n_h ∝ N_h·S_h across priority strata from exact
  *    integer stratum variances.
  *
  * Scale shapes: every statistic reduces on a bounded axis (≤50
  * quantity values, ≤500 price buckets, calendar months, 5 strata);
  * full-table scans happen exactly once per query.
  */
object Round182Queries {

  private val dec = "decimal(38,0)"

  /** Sign-safe e6 ratio: both engines truncate toward zero. */
  private def signedRatioE6(num: String, den: String) =
    s"""CASE WHEN $num >= 0
       |  THEN CAST(CAST($num AS $dec) * 1000000 div ($den) AS BIGINT)
       |  ELSE -CAST(CAST(-($num) AS $dec) * 1000000 div ($den) AS BIGINT)
       |END""".stripMargin

  private def signedRatioE6Sql(num: String, den: String) =
    s"""CASE WHEN $num >= 0
       |  THEN CAST(CAST($num AS HUGEINT) * 1000000 // ($den) AS BIGINT)
       |  ELSE -CAST(CAST(-($num) AS HUGEINT) * 1000000 // ($den) AS BIGINT)
       |END""".stripMargin

  /** (v, ca, cb) quantity axis: returned vs kept lineitem counts. */
  private def qtyAxis(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .select(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("v"),
        (col("l_returnflag") === "R").as("ret"))
      .groupBy(col("v"))
      .agg(sum(when(col("ret"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("ret"), 0L).otherwise(1L)).as("cb"))

  private val qtyAxisSql =
    """g AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS v,
      |        CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |          AS BIGINT) AS ca,
      |        CAST(sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)
      |          AS BIGINT) AS cb
      |      FROM lineitem GROUP BY 1)""".stripMargin

  /** Monthly net-revenue axis (cents) with a dense month rank. */
  private def monthAxis(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .select(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
        " div 2592000000000").as("mo"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy(col("mo")).agg(sum(col("c")).as("x"))
      .withColumn("rn", row_number().over(Window.orderBy(col("mo"))))

  private val monthAxisSql =
    """m AS (SELECT epoch_us(l_shipdate) // 2592000000000 AS mo,
      |        CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
      |          AS BIGINT)) AS BIGINT) AS x
      |      FROM lineitem GROUP BY 1),
      |mr AS (SELECT mo, x, CAST(row_number() OVER (ORDER BY mo)
      |         AS BIGINT) AS rn FROM m)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── Cliff's delta between returned and kept quantities.
    QueryDef("q_cliff_delta",
      (s, d) => {
        val g = qtyAxis(s, d)
        val tot = g.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        val w = Window.orderBy(col("v"))
        g.crossJoin(broadcast(tot))
          .withColumn("cumb_le", sum(col("cb")).over(w))
          .withColumn("cumb_lt", col("cumb_le") - col("cb"))
          .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
            sum(expr(s"CAST(ca AS $dec) * cumb_lt")).as("gt"),
            sum(expr(s"CAST(ca AS $dec) * (nb - cumb_le)")).as("lt"))
          .selectExpr("na", "nb", "CAST(gt AS BIGINT) AS gt",
            "CAST(lt AS BIGINT) AS lt",
            signedRatioE6("gt - lt", s"CAST(na AS $dec) * nb") +
              " AS cliff_delta_e6")
      },
      Some(s"""WITH $qtyAxisSql,
              |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
              |               CAST(sum(cb) AS BIGINT) AS nb FROM g),
              |c AS (SELECT v, ca, cb, na, nb,
              |        sum(cb) OVER (ORDER BY v) AS cumb_le,
              |        sum(cb) OVER (ORDER BY v) - cb AS cumb_lt
              |      FROM g CROSS JOIN tot),
              |agg AS (SELECT max(na) AS na, max(nb) AS nb,
              |          CAST(sum(CAST(ca AS HUGEINT) * cumb_lt)
              |            AS BIGINT) AS gt,
              |          CAST(sum(CAST(ca AS HUGEINT) * (nb - cumb_le))
              |            AS BIGINT) AS lt
              |        FROM c)
              |SELECT na, nb, gt, lt,
              |       ${signedRatioE6Sql("gt - lt",
                       "CAST(na AS HUGEINT) * nb")} AS cliff_delta_e6
              |FROM agg""".stripMargin)),

    // ── Kuiper V between urgent and relaxed order-value CDFs.
    QueryDef("q_kuiper_orders",
      (s, d) => {
        val g = Tables.orders(s, d)
          .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)" +
            " div 100000").as("bucket"),
            col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("urgent"))
          .groupBy(col("bucket"))
          .agg(sum(when(col("urgent"), 1L).otherwise(0L)).as("ca"),
            sum(when(col("urgent"), 0L).otherwise(1L)).as("cb"))
        val tot = g.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        val w = Window.orderBy(col("bucket"))
        g.crossJoin(broadcast(tot))
          .withColumn("d",
            expr(s"CAST(sum(ca) OVER (ORDER BY bucket) AS $dec) * nb" +
              s" - CAST(sum(cb) OVER (ORDER BY bucket) AS $dec) * na"))
          .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
            max(greatest(col("d"), lit(0L))).as("dplus"),
            max(greatest(-col("d"), lit(0L))).as("dminus"))
          .selectExpr("na", "nb",
            s"CAST(dplus * 1000000 div (CAST(na AS $dec) * nb) AS BIGINT)" +
              " AS dplus_e6",
            s"CAST(dminus * 1000000 div (CAST(na AS $dec) * nb)" +
              " AS BIGINT) AS dminus_e6",
            s"CAST((dplus + dminus) * 1000000" +
              s" div (CAST(na AS $dec) * nb) AS BIGINT) AS kuiper_v_e6")
      },
      Some("""WITH b AS (
             |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |           // 100000 AS bucket,
             |         o_orderpriority IN ('1-URGENT', '2-HIGH') AS urgent
             |  FROM orders),
             |g AS (SELECT bucket,
             |        CAST(sum(CASE WHEN urgent THEN 1 ELSE 0 END)
             |          AS BIGINT) AS ca,
             |        CAST(sum(CASE WHEN urgent THEN 0 ELSE 1 END)
             |          AS BIGINT) AS cb
             |      FROM b GROUP BY 1),
             |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
             |               CAST(sum(cb) AS BIGINT) AS nb FROM g),
             |c AS (SELECT bucket, na, nb,
             |        CAST(sum(ca) OVER (ORDER BY bucket) AS HUGEINT) * nb
             |          - CAST(sum(cb) OVER (ORDER BY bucket) AS HUGEINT)
             |            * na AS d
             |      FROM g CROSS JOIN tot),
             |agg AS (SELECT max(na) AS na, max(nb) AS nb,
             |          max(greatest(d, 0)) AS dplus,
             |          max(greatest(-d, 0)) AS dminus
             |        FROM c)
             |SELECT na, nb,
             |       CAST(dplus * 1000000 // (CAST(na AS HUGEINT) * nb)
             |         AS BIGINT) AS dplus_e6,
             |       CAST(dminus * 1000000 // (CAST(na AS HUGEINT) * nb)
             |         AS BIGINT) AS dminus_e6,
             |       CAST((dplus + dminus) * 1000000
             |         // (CAST(na AS HUGEINT) * nb) AS BIGINT)
             |         AS kuiper_v_e6
             |FROM agg""".stripMargin)),

    // ── Brunner–Munzel heteroscedastic rank test, returned vs kept.
    QueryDef("q_brunner_munzel",
      (s, d) => {
        val g = qtyAxis(s, d)
        val tot = g.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        val w = Window.orderBy(col("v"))
        val c = g.crossJoin(broadcast(tot))
          .withColumn("cuma_lt", sum(col("ca")).over(w) - col("ca"))
          .withColumn("cumb_lt", sum(col("cb")).over(w) - col("cb"))
          // doubled combined midrank and doubled placements
          .withColumn("r2",
            expr("2 * (cuma_lt + cumb_lt) + (ca + cb) + 1"))
          .withColumn("pa2", expr("2 * cumb_lt + cb"))
          .withColumn("pb2", expr("2 * cuma_lt + ca"))
        val agg = c.agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
          sum(expr(s"CAST(ca AS $dec) * r2")).as("s1r"),
          sum(expr(s"CAST(cb AS $dec) * r2")).as("s2r"),
          sum(expr(s"CAST(ca AS $dec) * pa2")).as("sp1"),
          sum(expr(s"CAST(ca AS $dec) * pa2 * pa2")).as("sp12"),
          sum(expr(s"CAST(cb AS $dec) * pb2")).as("sp2"),
          sum(expr(s"CAST(cb AS $dec) * pb2 * pb2")).as("sp22"),
          // #(a<b) pairs ×2 plus ties = Σ cb·(2·cuma_lt + ca) = Σ cb·pb2
          sum(expr(s"CAST(cb AS $dec) * pb2")).as("lt2"))
        agg.selectExpr("na", "nb",
          s"CAST(lt2 * 1000000 div (CAST(na AS $dec) * nb * 2)" +
            " AS BIGINT) AS p_hat_e6",
          // variance of placements per group from the doubled sums
          // (S_k² = (Σc·P² − (Σc·P)²/n_k) / (4(n_k−1))), then
          // W = (R̄₂−R̄₁)·sqrt(n₁n₂/N) / sqrt(N·(S₁²/n₂ + S₂²/n₁))
          """round((CAST(s2r AS DOUBLE) / (CAST('2.0' AS DOUBLE)
            |    * CAST(nb AS DOUBLE))
            |  - CAST(s1r AS DOUBLE) / (CAST('2.0' AS DOUBLE)
            |    * CAST(na AS DOUBLE)))
            |  * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
            |    / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
            |  / sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
            |    * ((CAST(sp12 AS DOUBLE) - CAST(sp1 AS DOUBLE)
            |        * CAST(sp1 AS DOUBLE) / CAST(na AS DOUBLE))
            |      / (CAST('4.0' AS DOUBLE) * (CAST(na AS DOUBLE)
            |        - CAST('1.0' AS DOUBLE)) * CAST(nb AS DOUBLE))
            |      + (CAST(sp22 AS DOUBLE) - CAST(sp2 AS DOUBLE)
            |        * CAST(sp2 AS DOUBLE) / CAST(nb AS DOUBLE))
            |      / (CAST('4.0' AS DOUBLE) * (CAST(nb AS DOUBLE)
            |        - CAST('1.0' AS DOUBLE)) * CAST(na AS DOUBLE)))),
            |  6) AS w_bm""".stripMargin)
      },
      Some(s"""WITH $qtyAxisSql,
              |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
              |               CAST(sum(cb) AS BIGINT) AS nb FROM g),
              |c AS (SELECT v, ca, cb, na, nb,
              |        sum(ca) OVER (ORDER BY v) - ca AS cuma_lt,
              |        sum(cb) OVER (ORDER BY v) - cb AS cumb_lt
              |      FROM g CROSS JOIN tot),
              |c2 AS (SELECT *,
              |         2 * (cuma_lt + cumb_lt) + (ca + cb) + 1 AS r2,
              |         2 * cumb_lt + cb AS pa2,
              |         2 * cuma_lt + ca AS pb2
              |       FROM c),
              |agg AS (SELECT max(na) AS na, max(nb) AS nb,
              |          sum(CAST(ca AS HUGEINT) * r2) AS s1r,
              |          sum(CAST(cb AS HUGEINT) * r2) AS s2r,
              |          sum(CAST(ca AS HUGEINT) * pa2) AS sp1,
              |          sum(CAST(ca AS HUGEINT) * pa2 * pa2) AS sp12,
              |          sum(CAST(cb AS HUGEINT) * pb2) AS sp2,
              |          sum(CAST(cb AS HUGEINT) * pb2 * pb2) AS sp22,
              |          sum(CAST(cb AS HUGEINT) * pb2) AS lt2
              |        FROM c2)
              |SELECT na, nb,
              |       CAST(lt2 * 1000000 // (CAST(na AS HUGEINT) * nb * 2)
              |         AS BIGINT) AS p_hat_e6,
              |       round((CAST(s2r AS DOUBLE) / (CAST('2.0' AS DOUBLE)
              |           * CAST(nb AS DOUBLE))
              |         - CAST(s1r AS DOUBLE) / (CAST('2.0' AS DOUBLE)
              |           * CAST(na AS DOUBLE)))
              |         * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
              |           / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
              |         / sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
              |           * ((CAST(sp12 AS DOUBLE) - CAST(sp1 AS DOUBLE)
              |               * CAST(sp1 AS DOUBLE) / CAST(na AS DOUBLE))
              |             / (CAST('4.0' AS DOUBLE) * (CAST(na AS DOUBLE)
              |               - CAST('1.0' AS DOUBLE)) * CAST(nb AS DOUBLE))
              |             + (CAST(sp22 AS DOUBLE) - CAST(sp2 AS DOUBLE)
              |               * CAST(sp2 AS DOUBLE) / CAST(nb AS DOUBLE))
              |             / (CAST('4.0' AS DOUBLE) * (CAST(nb AS DOUBLE)
              |               - CAST('1.0' AS DOUBLE))
              |               * CAST(na AS DOUBLE)))),
              |         6) AS w_bm
              |FROM agg""".stripMargin)),

    // ── k-sample Anderson–Darling across priority classes.
    QueryDef("q_ad_ksample",
      (s, d) => {
        val cells = Tables.orders(s, d)
          .select(col("o_orderpriority").as("pri"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)" +
              " div 100000").as("bucket"))
          .groupBy(col("pri"), col("bucket"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // bounded: 5 strata × ≤500 buckets
        val axis = cells.select(col("bucket")).distinct()
        val pris = cells.select(col("pri")).distinct()
        val dense = axis.crossJoin(broadcast(pris))
          .join(cells, Seq("pri", "bucket"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
        val wp = Window.partitionBy(col("pri")).orderBy(col("bucket"))
        val wb = Window.orderBy(col("bucket"))
        val bj = dense.groupBy(col("bucket"))
          .agg(sum(col("c")).as("cj"))
          .withColumn("b", sum(col("cj")).over(wb))
        val ni = dense.groupBy(col("pri")).agg(sum(col("c")).as("ni"))
        val nn = ni.agg(sum(col("ni")).as("n"))
        dense
          .withColumn("m", sum(col("c")).over(wp))
          .join(bj.select(col("bucket"), col("b")), "bucket")
          .join(ni, "pri").crossJoin(broadcast(nn))
          .filter(col("b") < col("n")) // last value drops (denominator 0)
          .withColumn("t",
            expr(s"(CAST(n AS $dec) * m - CAST(ni AS $dec) * b)" +
              s" * (CAST(n AS $dec) * m - CAST(ni AS $dec) * b)" +
              s" * 1000000 div (CAST(ni AS $dec) * b * (n - b))"))
          .agg(countDistinct(col("pri")).as("k"), max(col("n")).as("n"),
            sum(col("t")).as("a2"))
          .selectExpr("k", "n", "CAST(a2 AS BIGINT) AS a2_e6")
      },
      Some("""WITH cells AS (
             |  SELECT o_orderpriority AS pri,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |           // 100000 AS bucket,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM orders GROUP BY 1, 2),
             |dense AS (SELECT p.pri, a.bucket, coalesce(c.c, 0) AS c
             |          FROM (SELECT DISTINCT bucket FROM cells) a
             |          CROSS JOIN (SELECT DISTINCT pri FROM cells) p
             |          LEFT JOIN cells c
             |            ON c.pri = p.pri AND c.bucket = a.bucket),
             |bj AS (SELECT bucket, sum(sum(c))
             |           OVER (ORDER BY bucket) AS b
             |       FROM dense GROUP BY bucket),
             |ni AS (SELECT pri, CAST(sum(c) AS BIGINT) AS ni
             |       FROM dense GROUP BY 1),
             |nn AS (SELECT CAST(sum(ni) AS BIGINT) AS n FROM ni),
             |mm AS (SELECT d.pri, d.bucket,
             |         sum(d.c) OVER (PARTITION BY d.pri
             |           ORDER BY d.bucket) AS m,
             |         bj.b, ni.ni, nn.n
             |       FROM dense d JOIN bj ON bj.bucket = d.bucket
             |            JOIN ni ON ni.pri = d.pri CROSS JOIN nn),
             |terms AS (SELECT pri, n,
             |            (CAST(n AS HUGEINT) * m - CAST(ni AS HUGEINT) * b)
             |            * (CAST(n AS HUGEINT) * m
             |               - CAST(ni AS HUGEINT) * b)
             |            * 1000000 // (CAST(ni AS HUGEINT) * b * (n - b))
             |              AS t
             |          FROM mm WHERE b < n)
             |SELECT CAST(count(DISTINCT pri) AS BIGINT) AS k,
             |       max(n) AS n, CAST(sum(t) AS BIGINT) AS a2_e6
             |FROM terms""".stripMargin)),

    // ── Cox–Stuart sign trend test on monthly revenue.
    QueryDef("q_cox_stuart",
      (s, d) => {
        val m = monthAxis(s, d).localCheckpoint(false)
        val n = m.agg(count(lit(1)).as("n_months"))
        val h = m.crossJoin(broadcast(n))
          .withColumn("h", expr("n_months div 2"))
        val early = h.filter(col("rn") <= col("h"))
          .select(col("rn"), col("x").as("x1"), col("h"),
            col("n_months"))
        val late = h.select((col("rn") - col("h")).as("rn"),
          col("x").as("x2"))
        early.join(late, "rn")
          .agg(max(col("n_months")).as("n_months"),
            sum(when(col("x2") > col("x1"), 1L).otherwise(0L)).as("pos"),
            sum(when(col("x2") < col("x1"), 1L).otherwise(0L)).as("neg"),
            sum(when(col("x2") === col("x1"), 1L).otherwise(0L))
              .as("ties"))
          .selectExpr("n_months", "pos", "neg", "ties",
            """CASE WHEN pos + neg = 0 THEN NULL
              |ELSE round((CAST(pos AS DOUBLE) - CAST(neg AS DOUBLE))
              |  / sqrt(CAST(pos + neg AS DOUBLE)), 6)
              |END AS z_trend""".stripMargin)
      },
      Some(s"""WITH $monthAxisSql,
              |n AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM mr),
              |h AS (SELECT mr.*, n_months, n_months // 2 AS h
              |      FROM mr CROSS JOIN n),
              |p AS (SELECT e.n_months,
              |        CASE WHEN l.x > e.x THEN 1 ELSE 0 END AS is_pos,
              |        CASE WHEN l.x < e.x THEN 1 ELSE 0 END AS is_neg,
              |        CASE WHEN l.x = e.x THEN 1 ELSE 0 END AS is_tie
              |      FROM h e JOIN h l ON l.rn = e.rn + e.h
              |      WHERE e.rn <= e.h)
              |SELECT max(n_months) AS n_months,
              |       CAST(sum(is_pos) AS BIGINT) AS pos,
              |       CAST(sum(is_neg) AS BIGINT) AS neg,
              |       CAST(sum(is_tie) AS BIGINT) AS ties,
              |       CASE WHEN sum(is_pos) + sum(is_neg) = 0 THEN NULL
              |       ELSE round((CAST(sum(is_pos) AS DOUBLE)
              |           - CAST(sum(is_neg) AS DOUBLE))
              |         / sqrt(CAST(sum(is_pos) + sum(is_neg)
              |             AS DOUBLE)), 6)
              |       END AS z_trend
              |FROM p""".stripMargin)),

    // ── Pettitt changepoint on monthly revenue: U_t = Σ_{s≤t} V_s.
    QueryDef("q_pettitt_revenue",
      (s, d) => {
        val m = monthAxis(s, d).localCheckpoint(false)
        val v = m.crossJoin(broadcast(m.select(col("x").as("xb"))))
          .groupBy(col("rn"), col("mo"))
          .agg(sum(signum(col("x") - col("xb")).cast("long")).as("vt"))
        val u = v.withColumn("ut",
          sum(col("vt")).over(Window.orderBy(col("rn"))))
        u.withColumn("absu", abs(col("ut")))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("absu").desc, col("mo").asc)))
          .filter(col("rk") === 1)
          .crossJoin(broadcast(m.agg(count(lit(1)).as("n_months"))))
          .selectExpr("n_months", "absu AS k_stat", "mo AS t_star")
      },
      Some(s"""WITH $monthAxisSql,
              |v AS (SELECT a.rn, a.mo,
              |        CAST(sum(CASE WHEN a.x > b.x THEN 1
              |                      WHEN a.x < b.x THEN -1
              |                      ELSE 0 END) AS BIGINT) AS vt
              |      FROM mr a CROSS JOIN mr b
              |      GROUP BY 1, 2),
              |u AS (SELECT rn, mo, sum(vt) OVER (ORDER BY rn) AS ut
              |      FROM v),
              |best AS (SELECT mo, abs(ut) AS absu,
              |           row_number() OVER (ORDER BY abs(ut) DESC, mo)
              |             AS rk
              |         FROM u)
              |SELECT (SELECT CAST(count(*) AS BIGINT) FROM mr)
              |         AS n_months,
              |       CAST(absu AS BIGINT) AS k_stat, mo AS t_star
              |FROM best WHERE rk = 1""".stripMargin)),

    // ── Horvitz–Thompson estimator audit: deterministic 1/16 hash
    //    sample of orders, inflated total vs truth.
    QueryDef("q_ht_estimate",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("x"),
            (expr("CAST(conv(substring(md5(CAST(o_orderkey AS STRING))," +
              " 1, 6), 16, 10) AS BIGINT)") % 16 === 0).as("hit"))
        o.agg(count(lit(1)).as("n"),
            sum(when(col("hit"), 1L).otherwise(0L)).as("n_sampled"),
            sum(col("x")).as("total_cents"),
            sum(when(col("hit"), col("x")).otherwise(0L)).as("s_cents"))
          .selectExpr("n", "n_sampled", "total_cents",
            "s_cents * 16 AS ht_cents",
            signedRatioE6("s_cents * 16 - total_cents",
              "CAST(total_cents AS decimal(38,0))") + " AS rel_err_e6")
      },
      Some {
        val h = PortableSql.hexToLong(
          "md5(CAST(o_orderkey AS VARCHAR))", 6)
        s"""WITH o AS (
           |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x,
           |         ($h) % 16 = 0 AS hit
           |  FROM orders),
           |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |          CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_sampled,
           |          CAST(sum(x) AS BIGINT) AS total_cents,
           |          CAST(sum(CASE WHEN hit THEN x ELSE 0 END)
           |            AS BIGINT) AS s_cents
           |        FROM o)
           |SELECT n, n_sampled, total_cents,
           |       s_cents * 16 AS ht_cents,
           |       ${signedRatioE6Sql("s_cents * 16 - total_cents",
                    "CAST(total_cents AS HUGEINT)")} AS rel_err_e6
           |FROM agg""".stripMargin
      }),

    // ── Neyman allocation across priority strata (budget 10000).
    QueryDef("q_neyman_alloc",
      (s, d) => {
        val g = Tables.orders(s, d)
          .select(col("o_orderpriority").as("pri"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
              .as("x"))
          .groupBy(col("pri"))
          .agg(count(lit(1)).as("ni"), sum(col("x")).as("si"),
            sum(expr(s"CAST(x AS $dec) * x")).as("qi"))
          .filter(col("ni") >= 2L)
          .withColumn("si2",
            expr(s"CAST((CAST(ni AS $dec) * qi - CAST(si AS $dec) * si)" +
              s" div (CAST(ni AS $dec) * (ni - 1)) AS BIGINT)"))
          .withColumn("s_cents",
            expr("CAST(floor(sqrt(CAST(si2 AS DOUBLE)) + 0.5) AS BIGINT)"))
          .withColumn("wh", expr(s"CAST(ni AS $dec) * s_cents"))
        val tot = g.agg(sum(col("wh")).as("wtot"))
        g.crossJoin(broadcast(tot))
          .selectExpr("pri", "ni", "s_cents",
            "CAST(wh * 1000000 div wtot AS BIGINT) AS share_e6",
            "CAST(wh * 10000 div wtot AS BIGINT) AS alloc_10k")
      },
      Some("""WITH g0 AS (
             |  SELECT o_orderpriority AS pri,
             |         CAST(count(*) AS BIGINT) AS ni,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS si,
             |         sum(CAST(CAST(floor(o_totalprice * 100 + 0.5)
             |           AS BIGINT) AS HUGEINT)
             |           * CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |           AS qi
             |  FROM orders GROUP BY 1 HAVING count(*) >= 2),
             |g AS (SELECT pri, ni,
             |        CAST(floor(sqrt(CAST(
             |          CAST((CAST(ni AS HUGEINT) * qi
             |            - CAST(si AS HUGEINT) * si)
             |            // (CAST(ni AS HUGEINT) * (ni - 1)) AS BIGINT)
             |          AS DOUBLE)) + 0.5) AS BIGINT) AS s_cents
             |      FROM g0),
             |w AS (SELECT pri, ni, s_cents,
             |        CAST(ni AS HUGEINT) * s_cents AS wh FROM g),
             |tot AS (SELECT sum(wh) AS wtot FROM w)
             |SELECT pri, ni, s_cents,
             |       CAST(wh * 1000000 // wtot AS BIGINT) AS share_e6,
             |       CAST(wh * 10000 // wtot AS BIGINT) AS alloc_10k
             |FROM w CROSS JOIN tot""".stripMargin))
  )
}
