package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-142 batch: revenue growth accounting — the month-over-month
  * waterfall (new / expansion / contraction / churned customer-revenue
  * legs plus net revenue retention, the SaaS board slide), funnel
  * latency percentiles (signup→purchase lag p50/p90 per segment-less
  * user population by exact rank selection — q_funnel_lag reports only
  * the mean), and new-vs-repeat revenue split per month (first-purchase
  * attribution via one min-over-customer). Month axes are bounded;
  * every classification is a full-outer join on the customer×month
  * grain.
  */
object Round142Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Waterfall: per (customer, month) spend, consecutive months
    //    full-outer-joined (mi+1 key shift), each customer classified
    //    new/expansion/contraction/churn; NRR_e6 = retained-base
    //    revenue over prior-month base. 1996–1997 months only (dense
    //    span in the testdata calendar).
    QueryDef("q_revenue_waterfall",
      (s, d) => {
        val cm = Tables.orders(s, d)
          .filter(expr("year(o_orderdate) IN (1996, 1997)"))
          .groupBy(col("o_custkey").as("cust"),
            expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
              .as("mi"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("rev"))
          .localCheckpoint(false) // both sides of the month-shift join
        val prev = cm.select(col("cust"), (col("mi") + 1).as("mi"),
          col("rev").as("rev_prev"))
        cm.join(prev, Seq("cust", "mi"), "full_outer")
          .filter(col("mi") > expr("1996 * 12")) // first month has no prev
          .select(col("mi"),
            coalesce(col("rev"), lit(0L)).as("r"),
            coalesce(col("rev_prev"), lit(0L)).as("p"))
          .groupBy(col("mi"))
          .agg(
            sum(when(col("p") === 0L, col("r")).otherwise(0L)).as("new_rev"),
            sum(when(col("p") > 0L && col("r") > col("p"),
              col("r") - col("p")).otherwise(0L)).as("expansion"),
            sum(when(col("p") > 0L && col("r") > 0L && col("r") < col("p"),
              col("p") - col("r")).otherwise(0L)).as("contraction"),
            sum(when(col("r") === 0L, col("p")).otherwise(0L))
              .as("churned"),
            sum(when(col("p") > 0L, col("r")).otherwise(0L)).as("retained_r"),
            sum(col("p")).as("base"))
          .filter(col("base") > 0L)
          .selectExpr("CAST(mi AS BIGINT) AS mi",
            "CAST(new_rev AS BIGINT) AS new_rev",
            "CAST(expansion AS BIGINT) AS expansion",
            "CAST(contraction AS BIGINT) AS contraction",
            "CAST(churned AS BIGINT) AS churned",
            "retained_r * 1000000 div base AS nrr_e6")
      },
      Some("""WITH cm AS (
             |  SELECT o_custkey AS cust,
             |         year(o_orderdate) * 12 + month(o_orderdate) - 1
             |           AS mi,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS rev
             |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
             |  GROUP BY 1, 2),
             |j AS (SELECT coalesce(a.mi, b.mi + 1) AS mi,
             |             coalesce(a.rev, 0) AS r,
             |             coalesce(b.rev, 0) AS p
             |      FROM cm a FULL OUTER JOIN
             |           (SELECT cust, mi, rev FROM cm) b
             |        ON a.cust = b.cust AND a.mi = b.mi + 1),
             |agg AS (SELECT mi,
             |          CAST(sum(CASE WHEN p = 0 THEN r ELSE 0 END)
             |            AS BIGINT) AS new_rev,
             |          CAST(sum(CASE WHEN p > 0 AND r > p THEN r - p
             |            ELSE 0 END) AS BIGINT) AS expansion,
             |          CAST(sum(CASE WHEN p > 0 AND r > 0 AND r < p
             |            THEN p - r ELSE 0 END) AS BIGINT)
             |            AS contraction,
             |          CAST(sum(CASE WHEN r = 0 THEN p ELSE 0 END)
             |            AS BIGINT) AS churned,
             |          CAST(sum(CASE WHEN p > 0 THEN r ELSE 0 END)
             |            AS BIGINT) AS retained_r,
             |          CAST(sum(p) AS BIGINT) AS base
             |        FROM j WHERE mi > 1996 * 12 GROUP BY 1)
             |SELECT mi, new_rev, expansion, contraction, churned,
             |       retained_r * 1000000 // base AS nrr_e6
             |FROM agg WHERE base > 0""".stripMargin)),

    // ── Funnel latency percentiles: per user the first signup and the
    //    first LATER purchase; lag in minutes; p50/p90 by exact
    //    ceil-rank selection over (lag, user) — one user-keyed rollup,
    //    one unpartitioned rank on the post-aggregate lag axis.
    QueryDef("q_funnel_latency_percentiles",
      (s, d) => {
        val firsts = Tables.events(s, d)
          .filter(col("event_type").isin("signup", "purchase"))
          .groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "signup",
            expr("unix_micros(ts)"))).as("t_signup"),
            min(when(col("event_type") === "purchase",
              expr("unix_micros(ts)"))).as("t_purchase"))
          .filter(col("t_signup").isNotNull &&
            col("t_purchase").isNotNull &&
            col("t_purchase") > col("t_signup"))
          .select(col("user_id"),
            expr("(t_purchase - t_signup) div 60000000").as("lag_min"))
        val ranked = firsts
          .withColumn("rk", row_number().over(
            Window.orderBy(col("lag_min"), col("user_id"))).cast("long"))
          .withColumn("n", count(lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
        ranked.agg(max(col("n")).as("n_users"),
            max(when(col("rk") === expr("greatest(1, (n * 50 + 99) div 100)"),
              col("lag_min"))).as("p50_min"),
            max(when(col("rk") === expr("greatest(1, (n * 90 + 99) div 100)"),
              col("lag_min"))).as("p90_min"))
          .selectExpr("CAST(n_users AS BIGINT) AS n_users",
            "CAST(p50_min AS BIGINT) AS p50_min",
            "CAST(p90_min AS BIGINT) AS p90_min")
      },
      Some("""WITH f AS (
             |  SELECT user_id,
             |         min(CASE WHEN event_type = 'signup'
             |           THEN epoch_us(ts) END) AS t_signup,
             |         min(CASE WHEN event_type = 'purchase'
             |           THEN epoch_us(ts) END) AS t_purchase
             |  FROM events
             |  WHERE event_type IN ('signup', 'purchase')
             |  GROUP BY 1),
             |lags AS (SELECT user_id,
             |                (t_purchase - t_signup) // 60000000
             |                  AS lag_min
             |         FROM f
             |         WHERE t_signup IS NOT NULL
             |           AND t_purchase IS NOT NULL
             |           AND t_purchase > t_signup),
             |r AS (SELECT lag_min,
             |             CAST(row_number() OVER (ORDER BY lag_min,
             |               user_id) AS BIGINT) AS rk,
             |             CAST(count(*) OVER () AS BIGINT) AS n
             |      FROM lags)
             |SELECT CAST(max(n) AS BIGINT) AS n_users,
             |       CAST(max(CASE WHEN rk = greatest(1,
             |         (n * 50 + 99) // 100) THEN lag_min END) AS BIGINT)
             |         AS p50_min,
             |       CAST(max(CASE WHEN rk = greatest(1,
             |         (n * 90 + 99) // 100) THEN lag_min END) AS BIGINT)
             |         AS p90_min
             |FROM r""".stripMargin)),

    // ── New vs repeat revenue per month: first-purchase month via ONE
    //    customer-keyed min; each order's revenue attributed new if its
    //    month equals the customer's first. Bounded month output.
    QueryDef("q_new_vs_repeat",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey").as("cust"),
            expr("year(o_orderdate) * 100 + month(o_orderdate)").as("mo"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("rev"))
        val first = o.groupBy(col("cust")).agg(min(col("mo")).as("mo0"))
        o.join(first, "cust")
          .groupBy(col("mo"))
          .agg(sum(when(col("mo") === col("mo0"), col("rev"))
            .otherwise(0L)).as("new_rev"),
            sum(when(col("mo") =!= col("mo0"), col("rev"))
              .otherwise(0L)).as("repeat_rev"),
            count(lit(1)).as("n_orders"))
          .selectExpr("CAST(mo AS BIGINT) AS mo",
            "CAST(new_rev AS BIGINT) AS new_rev",
            "CAST(repeat_rev AS BIGINT) AS repeat_rev",
            "CAST(n_orders AS BIGINT) AS n_orders",
            """CASE WHEN new_rev + repeat_rev = 0 THEN 0
              |ELSE repeat_rev * 1000000 div (new_rev + repeat_rev)
              |END AS repeat_share_e6""".stripMargin)
      },
      Some("""WITH o AS (
             |  SELECT o_custkey AS cust,
             |         year(o_orderdate) * 100 + month(o_orderdate)
             |           AS mo,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |           AS rev
             |  FROM orders),
             |f AS (SELECT cust, min(mo) AS mo0 FROM o GROUP BY 1)
             |SELECT CAST(o.mo AS BIGINT) AS mo,
             |       CAST(sum(CASE WHEN o.mo = f.mo0 THEN rev ELSE 0
             |         END) AS BIGINT) AS new_rev,
             |       CAST(sum(CASE WHEN o.mo <> f.mo0 THEN rev ELSE 0
             |         END) AS BIGINT) AS repeat_rev,
             |       CAST(count(*) AS BIGINT) AS n_orders,
             |       CASE WHEN sum(rev) = 0 THEN 0
             |         ELSE CAST(sum(CASE WHEN o.mo <> f.mo0 THEN rev
             |           ELSE 0 END) AS BIGINT) * 1000000
             |           // CAST(sum(rev) AS BIGINT)
             |       END AS repeat_share_e6
             |FROM o JOIN f ON o.cust = f.cust
             |GROUP BY 1""".stripMargin))
  )
}
