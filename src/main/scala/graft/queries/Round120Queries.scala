package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-120 batch: ordinal-agreement and distribution-shape screens —
  * linear-weighted Cohen's κ (ordinal raters, where q_cohen_kappa's
  * unweighted form throws away near-miss credit), the Lorenz asymmetry
  * coefficient (WHICH side of the Lorenz curve q_gini's area number
  * comes from), and the mean-excess profile (the EVT threshold
  * diagnostic that decides where q_hill_tail's power-law fit may
  * start). Everything is integer-exact until a single final division.
  */
object Round120Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Linear-weighted κ between the order's priority class (rater A,
    //    ordinal 1..5) and its price quintile (rater B via ntile(5) —
    //    deterministic (totalprice, orderkey) order). κ_w = 1 −
    //    N·ΣwO / ΣwRC with w = |i−j|; the close is a sign-factored e6
    //    division (κ can be negative). The 5×5 cell grid plus margins
    //    are broadcast-sized.
    QueryDef("q_kappa_weighted",
      (s, d) => {
        val rated = Tables.orders(s, d)
          .select(substring(col("o_orderpriority"), 1, 1)
            .cast("long").as("a"),
            col("o_totalprice"), col("o_orderkey"))
          .withColumn("b", ntile(5).over(
            Window.orderBy(col("o_totalprice"), col("o_orderkey")))
            .cast("long"))
        val cells = rated.groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("o"))
          .localCheckpoint(false) // margins + the weighted folds
        val ra = cells.groupBy(col("a")).agg(sum(col("o")).as("r"))
        val cb = cells.groupBy(col("b")).agg(sum(col("o")).as("c"))
        val wo = cells.agg(sum(expr("abs(a - b) * o")).as("swo"),
          sum(col("o")).as("nn"))
        val wrc = ra.crossJoin(cb)
          .agg(sum(expr("abs(a - b) * r * c")).as("swrc"))
        wo.crossJoin(broadcast(wrc))
          .selectExpr("CAST(nn AS BIGINT) AS n",
            "CAST(swo AS BIGINT) AS sum_w_obs",
            "CAST(swrc AS BIGINT) AS sum_w_exp",
            """CASE WHEN swrc = 0 THEN CAST(NULL AS BIGINT)
              |WHEN swrc - nn * swo >= 0
              |  THEN (swrc - nn * swo) * 1000000 div swrc
              |ELSE -((nn * swo - swrc) * 1000000 div swrc)
              |END AS kappa_w_e6""".stripMargin)
      },
      Some("""WITH rated AS (
             |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT)
             |           AS a,
             |         CAST(ntile(5) OVER (ORDER BY o_totalprice,
             |           o_orderkey) AS BIGINT) AS b
             |  FROM orders),
             |cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o
             |          FROM rated GROUP BY 1, 2),
             |ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r
             |       FROM cells GROUP BY 1),
             |cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c
             |       FROM cells GROUP BY 1),
             |wo AS (SELECT CAST(sum(abs(a - b) * o) AS BIGINT) AS swo,
             |              CAST(sum(o) AS BIGINT) AS nn
             |       FROM cells),
             |wrc AS (SELECT CAST(sum(abs(a - b) * r * c) AS BIGINT)
             |                 AS swrc
             |        FROM ra CROSS JOIN cb)
             |SELECT nn AS n, swo AS sum_w_obs, swrc AS sum_w_exp,
             |       CASE WHEN swrc = 0 THEN CAST(NULL AS BIGINT)
             |            WHEN swrc - nn * swo >= 0
             |              THEN (swrc - nn * swo) * 1000000 // swrc
             |            ELSE -((nn * swo - swrc) * 1000000 // swrc)
             |       END AS kappa_w_e6
             |FROM wo CROSS JOIN wrc""".stripMargin)),

    // ── Lorenz asymmetry S = F(μ) + L(μ) on order totalprice cents:
    //    F = fraction of orders below the mean, L = their revenue
    //    share. Exact integers throughout (below-mean test cross-
    //    multiplies v·n < T), S in e6 = F_e6 + L_e6. S ≷ 1 says the
    //    inequality q_gini measures comes from small-order mass vs
    //    giant-order tail.
    QueryDef("q_lorenz_asymmetry",
      (s, d) => {
        val v = Tables.orders(s, d)
          .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("v"))
        val tot = v.agg(count(lit(1)).as("n"), sum(col("v")).as("t"))
        v.crossJoin(broadcast(tot))
          .agg(max(col("n")).as("n"), max(col("t")).as("t"),
            sum(when(expr("v * n < t"), 1L).otherwise(0L)).as("n_below"),
            sum(when(expr("v * n < t"), col("v")).otherwise(0L))
              .as("mass_below"))
          .selectExpr("CAST(n AS BIGINT) AS n",
            "CAST(n_below AS BIGINT) AS n_below",
            "n_below * 1000000 div n AS f_e6",
            "mass_below * 1000000 div t AS l_e6",
            "n_below * 1000000 div n + mass_below * 1000000 div t AS s_e6")
      },
      Some("""WITH v AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
             |                    AS BIGINT) AS v
             |           FROM orders),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(v) AS BIGINT) AS t FROM v),
             |agg AS (SELECT max(n) AS n, max(t) AS t,
             |               CAST(sum(CASE WHEN v * n < t THEN 1 ELSE 0
             |                 END) AS BIGINT) AS n_below,
             |               CAST(sum(CASE WHEN v * n < t THEN v ELSE 0
             |                 END) AS BIGINT) AS mass_below
             |        FROM v CROSS JOIN tot)
             |SELECT n, n_below,
             |       n_below * 1000000 // n AS f_e6,
             |       mass_below * 1000000 // t AS l_e6,
             |       n_below * 1000000 // n + mass_below * 1000000 // t
             |         AS s_e6
             |FROM agg""".stripMargin)),

    // ── Mean-excess profile: thresholds = the order-value deciles
    //    (deterministic rank cutpoints), e(u) = mean(v − u | v > u)
    //    exact integer cents. A linearly rising profile ⇒ heavy
    //    (GPD-like) tail and tells q_hill_tail where the power law
    //    starts. Cutpoints come from a DISTRIBUTED two-phase exact rank
    //    selection — a bounded value-bucket histogram locates each
    //    target rank's bucket, then a bucket-partitioned window picks
    //    the exact value at the local offset. No global single-
    //    partition sort ever touches the raw rows (the 100 TB shape);
    //    the DuckDB oracle keeps the naive global row_number, which
    //    selects the identical multiset positions.
    QueryDef("q_mean_excess",
      (s, d) => {
        val v = Tables.orders(s, d)
          .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("v"))
          .localCheckpoint(false) // histogram + bucket probe + excess pass
        val hist = v.groupBy(expr("v div 100000").as("bkt"))
          .agg(count(lit(1)).as("bc"))
        // Bucket axis = value range / 1e5 cents — bounded by the price
        // domain (~600 buckets), not data volume: window is safe.
        val off = hist
          .withColumn("cum", sum(col("bc")).over(Window.orderBy(col("bkt"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("prev", col("cum") - col("bc"))
        val n = v.agg(count(lit(1)).as("n"))
        val targets = n.select(col("n"),
          explode(sequence(lit(1), lit(9))).as("decile"))
          .select(col("decile"), expr("n * decile div 10").as("t_rn"))
        val probe = targets.join(off,
            col("t_rn") > col("prev") && col("t_rn") <= col("cum"))
          .select(col("decile"), col("bkt"),
            (col("t_rn") - col("prev")).as("local_rn"))
        val cuts = v.withColumn("bkt", expr("v div 100000"))
          .join(broadcast(probe), "bkt")
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("decile")).orderBy(col("v"))).cast("long"))
          .filter(col("rn") === col("local_rn"))
          .select(col("decile"), col("v").as("u"))
        val exceed = v.crossJoin(broadcast(cuts))
          .filter(col("v") > col("u"))
          .groupBy(col("decile"), col("u"))
          .agg(count(lit(1)).as("n_exceed"),
            sum(col("v") - col("u")).as("excess_sum"))
        exceed.selectExpr("CAST(decile AS BIGINT) AS decile",
            "u AS threshold_cents",
            "CAST(n_exceed AS BIGINT) AS n_exceed",
            "excess_sum div n_exceed AS mean_excess_cents")
          .orderBy(col("decile"))
      },
      Some("""WITH v AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
             |                    AS BIGINT) AS v
             |           FROM orders),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
             |targets AS (SELECT d.decile, n * d.decile // 10 AS t_rn
             |            FROM n CROSS JOIN
             |              (SELECT unnest(generate_series(1, 9))
             |                 AS decile) d),
             |rk AS (SELECT v, CAST(row_number() OVER (ORDER BY v)
             |                AS BIGINT) AS rn
             |       FROM v),
             |cuts AS (SELECT decile, v AS u
             |         FROM rk JOIN targets ON rn = t_rn),
             |ex AS (SELECT decile, u,
             |              CAST(count(*) AS BIGINT) AS n_exceed,
             |              CAST(sum(v.v - u) AS BIGINT) AS excess_sum
             |       FROM v CROSS JOIN cuts WHERE v.v > u
             |       GROUP BY 1, 2)
             |SELECT CAST(decile AS BIGINT) AS decile,
             |       u AS threshold_cents, n_exceed,
             |       excess_sum // n_exceed AS mean_excess_cents
             |FROM ex""".stripMargin))
  )
}
