package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-162 batch:
  *
  *  - Edit-distance record linkage (`q_edit_blocked_join`): fuzzy-join
  *    part names under Levenshtein ≤ 2 with BLOCKING (same first token,
  *    same length band) so candidates are per-block pairs, never the
  *    all-pairs n² — the sorted-neighborhood/banding discipline every
  *    linkage op in ops/Dedup keeps. Both engines evaluate the same DP
  *    (`levenshtein` builtin), so the distances agree exactly.
  *  - Cox partial-likelihood SCORE test at β=0 (`q_cox_score`): does
  *    order value predict time-to-completion? The Breslow-ties score
  *    U = Σ_t (Σx_events,t − d_t·x̄_риск,t) and information V from
  *    suffix moments over the distinct-duration axis — the log-rank
  *    machinery (q_logrank) generalized to a CONTINUOUS covariate,
  *    same one-aggregate-plus-bounded-axis-walk shape as kaplanMeier.
  *  - Fixed-effect meta-analysis (`q_meta_fixed`): per-nation
  *    urgent-vs-other order-value effects pooled by inverse-variance
  *    weights, plus Cochran's Q and I² heterogeneity — the
  *    cross-cohort pooling read-out (per-shard A/B results, per-site
  *    experiments) the registry lacked. Hecto-dollar units and a
  *    weight cap keep every moment in BIGINT at any skew.
  */
object Round162Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Blocked fuzzy join, DEDUPE-FIRST: collapse rows to the
    //    distinct-name axis with multiplicities BEFORE any edit
    //    distance (the r10 bench caught the naive form at 27.9 s —
    //    20.9M row-level pairs ran the DP for only 64 distinct names).
    //    Exact-duplicate pairs are analytic (Σ cnt·(cnt−1)/2, distance
    //    0, no DP at all); the Levenshtein DP runs only on in-block
    //    distinct-name pairs, weighted back by cnt_a·cnt_b. Block key =
    //    (first token, len div 4) — the recall/cost trade every
    //    blocking linkage makes, reported as block_frac_e6.
    QueryDef("q_edit_blocked_join",
      (s, d) => {
        val names = Tables.part(s, d)
          .groupBy(col("p_name").as("nm"))
          .agg(count(lit(1)).as("cnt"))
          .selectExpr("nm", "cnt", "split(nm, ' ')[0] AS tok0",
            "length(nm) div 4 AS lenb")
          .localCheckpoint(false) // distinct-name axis: pairs + totals
        val exact = names.agg(sum(expr("cnt * (cnt - 1) div 2")).as("d0"),
          sum(col("cnt")).as("n_parts"), count(lit(1)).as("n_names"))
        val cross = names.as("a").join(names.as("b"),
            col("a.tok0") === col("b.tok0") &&
              col("a.lenb") === col("b.lenb") &&
              col("a.nm") < col("b.nm"))
          .select(levenshtein(col("a.nm"), col("b.nm")).as("dist"),
            (col("a.cnt") * col("b.cnt")).as("w"))
          .agg(coalesce(sum(when(col("dist") === 1, col("w"))), lit(0L))
            .as("d1"),
            coalesce(sum(when(col("dist") === 2, col("w"))), lit(0L))
              .as("d2"),
            coalesce(sum(col("w")), lit(0L)).as("cross_cands"))
        exact.crossJoin(broadcast(cross))
          .selectExpr("n_parts", "CAST(n_names AS BIGINT) AS n_names",
            "d0", "d1", "d2", "d0 + cross_cands AS n_cands",
            """(d0 + cross_cands) * 1000000
              | div (n_parts * (n_parts - 1) div 2) AS block_frac_e6"""
              .stripMargin)
      },
      Some("""WITH names AS (
             |  SELECT nm, cnt, string_split(nm, ' ')[1] AS tok0,
             |         length(nm) // 4 AS lenb
             |  FROM (SELECT p_name AS nm, CAST(count(*) AS BIGINT) AS cnt
             |        FROM part GROUP BY 1)),
             |ex AS (SELECT CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) AS d0,
             |              CAST(sum(cnt) AS BIGINT) AS n_parts,
             |              CAST(count(*) AS BIGINT) AS n_names
             |       FROM names),
             |cr AS (SELECT
             |         CAST(coalesce(sum(CASE WHEN dist = 1 THEN w END), 0)
             |           AS BIGINT) AS d1,
             |         CAST(coalesce(sum(CASE WHEN dist = 2 THEN w END), 0)
             |           AS BIGINT) AS d2,
             |         CAST(coalesce(sum(w), 0) AS BIGINT) AS cross_cands
             |       FROM (SELECT levenshtein(a.nm, b.nm) AS dist,
             |                    a.cnt * b.cnt AS w
             |             FROM names a JOIN names b
             |               ON a.tok0 = b.tok0 AND a.lenb = b.lenb
             |                  AND a.nm < b.nm))
             |SELECT n_parts, n_names, d0, d1, d2,
             |       d0 + cross_cands AS n_cands,
             |       (d0 + cross_cands) * 1000000
             |         // (n_parts * (n_parts - 1) // 2) AS block_frac_e6
             |FROM ex CROSS JOIN cr""".stripMargin)),

    // ── Cox score at β=0, Breslow ties: duration = days to dataset
    //    end, event = order status F, covariate = hecto-dollars.
    //    Suffix (risk-set) moments ride ONE desc-cumulative window over
    //    the distinct-duration axis; means truncate identically in
    //    both engines. χ² = U²/V to 1e-3 via the div/mod split (no
    //    overflow: U ≤ 7.5e8 hecto at sf0.1 → U² ≤ 5.6e17).
    QueryDef("q_cox_score",
      (s, d) => {
        val base0 = Tables.orders(s, d).selectExpr(
          "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS dday",
          "CASE WHEN o_orderstatus = 'F' THEN 1L ELSE 0L END AS ev",
          "CAST(floor(o_totalprice) AS BIGINT) div 100 AS x")
        val mx = base0.agg(max(col("dday")).as("mxd"))
        val base = base0.crossJoin(broadcast(mx))
          .selectExpr("mxd - dday AS t", "ev", "x")
        val grp = base.groupBy(col("t"))
          .agg(count(lit(1)).as("leave"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sx2"),
            sum(col("ev")).as("d_t"),
            sum(col("ev") * col("x")).as("sxe"))
        // no checkpoint: single consumer, and the visible Aggregate is
        // what keeps the unpartitioned suffix window gate-legal
        val sfx = Window.orderBy(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grp
          .withColumn("n_r", sum(col("leave")).over(sfx))
          .withColumn("sx_r", sum(col("sx")).over(sfx))
          .withColumn("sx2_r", sum(col("sx2")).over(sfx))
          .filter(col("d_t") > 0)
          .withColumn("xbar", expr("sx_r div n_r"))
          .withColumn("u_t", expr("sxe - d_t * xbar"))
          .withColumn("v_t",
            expr("d_t * (sx2_r div n_r - xbar * xbar)"))
          .agg(sum(col("u_t")).as("u"), sum(col("v_t")).as("v"),
            count(lit(1)).as("n_event_times"))
          .selectExpr("CAST(n_event_times AS BIGINT) AS n_event_times",
            "u", "v",
            """(u * u div greatest(1L, v)) * 1000
              | + ((u * u) % greatest(1L, v)) * 1000 div greatest(1L, v)
              | AS chi2_e3""".stripMargin)
      },
      Some("""WITH base0 AS (
             |  SELECT epoch_us(o_orderdate) // 86400000000 AS dday,
             |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
             |           AS ev,
             |         CAST(floor(o_totalprice) AS BIGINT) // 100 AS x
             |  FROM orders),
             |mx AS (SELECT CAST(max(dday) AS BIGINT) AS mxd FROM base0),
             |base AS (SELECT mxd - dday AS t, ev, x
             |         FROM base0 CROSS JOIN mx),
             |grp AS (SELECT t, CAST(count(*) AS BIGINT) AS leave,
             |               CAST(sum(x) AS BIGINT) AS sx,
             |               CAST(sum(x * x) AS BIGINT) AS sx2,
             |               CAST(sum(ev) AS BIGINT) AS d_t,
             |               CAST(sum(ev * x) AS BIGINT) AS sxe
             |        FROM base GROUP BY t),
             |cum AS (SELECT *,
             |          CAST(sum(leave) OVER w AS BIGINT) AS n_r,
             |          CAST(sum(sx) OVER w AS BIGINT) AS sx_r,
             |          CAST(sum(sx2) OVER w AS BIGINT) AS sx2_r
             |        FROM grp
             |        WINDOW w AS (ORDER BY t DESC ROWS UNBOUNDED
             |          PRECEDING)),
             |terms AS (SELECT sxe - d_t * (sx_r // n_r) AS u_t,
             |                 d_t * (sx2_r // n_r
             |                   - (sx_r // n_r) * (sx_r // n_r)) AS v_t
             |          FROM cum WHERE d_t > 0)
             |SELECT CAST(count(*) AS BIGINT) AS n_event_times,
             |       CAST(sum(u_t) AS BIGINT) AS u,
             |       CAST(sum(v_t) AS BIGINT) AS v,
             |       (CAST(sum(u_t) AS BIGINT) * CAST(sum(u_t) AS BIGINT)
             |          // greatest(1, CAST(sum(v_t) AS BIGINT))) * 1000
             |       + ((CAST(sum(u_t) AS BIGINT) * CAST(sum(u_t) AS BIGINT))
             |          % greatest(1, CAST(sum(v_t) AS BIGINT))) * 1000
             |          // greatest(1, CAST(sum(v_t) AS BIGINT)) AS chi2_e3
             |FROM terms""".stripMargin)),

    // ── Fixed-effect meta-analysis: per-nation effect θ = mean
    //    hecto-dollar order value, URGENT minus other; weight =
    //    min(1e9, 1e12/se²); pooled θ̂, Cochran's Q (e0, weights
    //    pre-scaled by 1e3), I². Nations with an empty arm drop.
    QueryDef("q_meta_fixed",
      (s, d) => {
        val o = Tables.orders(s, d).selectExpr("o_custkey",
          "CASE WHEN o_orderpriority = '1-URGENT' THEN 1L ELSE 0L END AS g",
          "CAST(floor(o_totalprice) AS BIGINT) div 100 AS x")
        val cust = Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey"),
            col("c_nationkey").as("nk"))
        val arms = o.join(broadcast(cust), "o_custkey")
          .groupBy(col("nk"), col("g"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sx2"))
        val eff = arms.filter(col("g") === 1)
          .selectExpr("nk", "n AS n1", "sx AS s1", "sx2 AS q1")
          .join(arms.filter(col("g") === 0)
            .selectExpr("nk", "n AS n0", "sx AS s0", "sx2 AS q0"), "nk")
          .filter(col("n1") > 1 && col("n0") > 1)
          .selectExpr("nk", "s1 div n1 - s0 div n0 AS theta",
            """((q1 - s1 * s1 div n1) + (q0 - s0 * s0 div n0))
              | div (n1 + n0 - 2) AS pvar""".stripMargin,
            "n1", "n0")
          .selectExpr("nk", "theta",
            "greatest(1L, pvar * (n1 + n0) div (n1 * n0)) AS se2")
          .withColumn("w", least(lit(1000000000L),
            expr("1000000000000L div se2")))
          .localCheckpoint(false) // nation axis; pooled + Q share it
        val pooled = eff.agg(expr("sum(w * theta) div sum(w)").as("th"),
          count(lit(1)).as("k"))
        eff.crossJoin(broadcast(pooled))
          .agg(first(col("th")).as("theta_hat_h"), first(col("k")).as("k"),
            sum(expr("(w div 1000) * (theta - th) * (theta - th)"))
              .as("q_scaled"))
          // Q_true = q_scaled/1e9 (w carries 1e12, pre-divided by 1e3),
          // so the df threshold in q_scaled units is (k−1)·1e9; I²
          // computed at 1e-6 resolution via the pre-shrunk denominator
          // (q_scaled div 1e6 ≥ 24e3 whenever Q > df → rel err ≤ 4e-5)
          .selectExpr("CAST(k AS BIGINT) AS n_cohorts", "theta_hat_h",
            "q_scaled",
            """CASE WHEN q_scaled > (k - 1) * 1000000000L
              | THEN greatest(0L, 1000000L - (k - 1) * 1000000000L
              |   div greatest(1L, q_scaled div 1000000L))
              | ELSE 0L END AS i2_e6""".stripMargin)
      },
      Some("""WITH o AS (SELECT o_custkey,
             |                 CASE WHEN o_orderpriority = '1-URGENT'
             |                   THEN 1 ELSE 0 END AS g,
             |                 CAST(floor(o_totalprice) AS BIGINT) // 100
             |                   AS x
             |           FROM orders),
             |cust AS (SELECT c_custkey AS o_custkey, c_nationkey AS nk
             |         FROM customer),
             |arms AS (SELECT nk, g, CAST(count(*) AS BIGINT) AS n,
             |                CAST(sum(x) AS BIGINT) AS sx,
             |                CAST(sum(x * x) AS BIGINT) AS sx2
             |         FROM o JOIN cust USING (o_custkey) GROUP BY 1, 2),
             |eff0 AS (SELECT a.nk, a.sx // a.n - b.sx // b.n AS theta,
             |                ((a.sx2 - a.sx * a.sx // a.n)
             |                  + (b.sx2 - b.sx * b.sx // b.n))
             |                  // (a.n + b.n - 2) AS pvar,
             |                a.n AS n1, b.n AS n0
             |         FROM arms a JOIN arms b
             |           ON a.nk = b.nk AND a.g = 1 AND b.g = 0
             |         WHERE a.n > 1 AND b.n > 1),
             |eff AS (SELECT nk, theta,
             |               least(1000000000, CAST(1000000000000 AS BIGINT)
             |                 // greatest(1, pvar * (n1 + n0)
             |                   // (n1 * n0))) AS w
             |        FROM eff0),
             |pooled AS (SELECT CAST(sum(w * theta) AS BIGINT)
             |                    // CAST(sum(w) AS BIGINT) AS th,
             |                  CAST(count(*) AS BIGINT) AS k
             |           FROM eff),
             |qq AS (SELECT k, min(th) AS theta_hat_h,
             |              CAST(sum((w // 1000) * (theta - th)
             |                * (theta - th)) AS BIGINT) AS q_scaled
             |       FROM eff CROSS JOIN pooled GROUP BY k)
             |SELECT k AS n_cohorts, theta_hat_h, q_scaled,
             |       CASE WHEN q_scaled > (k - 1) * CAST(1000000000
             |           AS BIGINT)
             |         THEN greatest(0, 1000000 - (k - 1)
             |           * CAST(1000000000 AS BIGINT)
             |           // greatest(1, q_scaled // 1000000))
             |         ELSE 0 END AS i2_e6
             |FROM qq""".stripMargin))
  )
}
