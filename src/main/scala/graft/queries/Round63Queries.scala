package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-63 batch: event-study coefficients (dynamic treatment effects
  * by relative month — the pre-trend check q_diff_in_diff's single
  * post flag hides), per-segment weighted quantiles (order-count-
  * weighted balance quartiles — the weighted generalization of
  * q_grouped_median), and U-shaped position-based attribution
  * (40/20/40 multi-touch credit — the positional model between
  * q_attribution's endpoints and q_markov_attribution/
  * q_shapley_attribution).
  */
object Round63Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Event study: treated = even nations at 1995-01; per relative
    //    month −6..+6 the treated/control mean monthly order value.
    QueryDef("q_event_study",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), (col("c_nationkey") % 2 === 0).as("tr"))
        Tables.orders(s, d)
          .join(cust, col("o_custkey") === col("c_custkey"))
          .select(
            (expr("year(o_orderdate) * 12 + month(o_orderdate)")
              - lit(1995 * 12 + 1)).as("rel"),
            col("tr"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
          .where(col("rel").between(-6L, 6L))
          .groupBy(col("rel"))
          .agg(sum(when(col("tr"), 1L).otherwise(0L)).as("n_t"),
            sum(when(!col("tr"), 1L).otherwise(0L)).as("n_c"),
            sum(when(col("tr"), col("cents")).otherwise(0L)).as("s_t"),
            sum(when(!col("tr"), col("cents")).otherwise(0L)).as("s_c"))
          .selectExpr("rel", "n_t", "n_c",
            "s_t div n_t AS mean_t_cents", "s_c div n_c AS mean_c_cents",
            "s_t div n_t - s_c div n_c AS diff_cents")
      },
      Some("""WITH o AS (
             |  SELECT year(o_orderdate) * 12 + month(o_orderdate)
             |           - (1995 * 12 + 1) AS rel,
             |         c_nationkey % 2 = 0 AS tr,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |g AS (SELECT rel,
             |             CAST(sum(CASE WHEN tr THEN 1 ELSE 0 END)
             |               AS BIGINT) AS n_t,
             |             CAST(sum(CASE WHEN tr THEN 0 ELSE 1 END)
             |               AS BIGINT) AS n_c,
             |             CAST(sum(CASE WHEN tr THEN cents ELSE 0 END)
             |               AS BIGINT) AS s_t,
             |             CAST(sum(CASE WHEN tr THEN 0 ELSE cents END)
             |               AS BIGINT) AS s_c
             |      FROM o WHERE rel BETWEEN -6 AND 6 GROUP BY 1)
             |SELECT rel, n_t, n_c, s_t // n_t AS mean_t_cents,
             |       s_c // n_c AS mean_c_cents,
             |       s_t // n_t - s_c // n_c AS diff_cents
             |FROM g""".stripMargin)),

    // ── Weighted quartiles: per segment, balance cents weighted by the
    //    customer's order count; smallest value whose cumulative weight
    //    reaches k/4 of the total (k = 1, 2, 3).
    QueryDef("q_weighted_quantile",
      (s, d) => {
        val w8 = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("wgt"))
        val units = Tables.customer(s, d)
          .join(w8, col("c_custkey") === col("o_custkey"))
          .select(col("c_mktsegment").as("seg"),
            floor(col("c_acctbal") * 100 + 0.5).cast("long").as("v"),
            col("wgt"), col("c_custkey").as("ck"))
        val win = Window.partitionBy(col("seg"))
          .orderBy(col("v"), col("ck"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = units
          .withColumn("cumw", sum(col("wgt")).over(win))
          .withColumn("totw", sum(col("wgt")).over(
            Window.partitionBy(col("seg"))))
          .localCheckpoint(false) // reused by the 3 quartile picks
        Seq(1, 2, 3).map { k =>
          cum.where(col("cumw") * 4 >= col("totw") * k)
            .withColumn("rn", row_number().over(
              Window.partitionBy(col("seg"))
                .orderBy(col("v"), col("ck"))))
            .where(col("rn") === 1)
            .select(col("seg"), lit(k.toLong * 25).as("pct"),
              col("v").as("value_cents"), col("totw"))
        }.reduce(_ unionByName _)
      },
      Some {
        def pick(k: Int) =
          s"""SELECT seg, CAST(${k * 25} AS BIGINT) AS pct,
             |       v AS value_cents, totw
             |FROM (SELECT seg, v, totw,
             |             row_number() OVER (PARTITION BY seg
             |               ORDER BY v, ck) AS rn
             |      FROM cum WHERE cumw * 4 >= totw * $k)
             |WHERE rn = 1""".stripMargin
        s"""WITH w8 AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS wgt
           |           FROM orders GROUP BY 1),
           |units AS (
           |  SELECT c_mktsegment AS seg,
           |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
           |         wgt, c_custkey AS ck
           |  FROM customer JOIN w8 ON c_custkey = o_custkey),
           |cum AS (
           |  SELECT seg, v, ck, wgt,
           |         CAST(sum(wgt) OVER (PARTITION BY seg ORDER BY v, ck
           |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
           |         CAST(sum(wgt) OVER (PARTITION BY seg) AS BIGINT) AS totw
           |  FROM units)
           |${Seq(1, 2, 3).map(pick).mkString("\nUNION ALL\n")}"""
          .stripMargin
      }),

    // ── Position-based (U-shape) attribution: 40/20/40 credit across
    //    each user's ordered touch sequence, summed per channel.
    QueryDef("q_position_attribution",
      (s, d) => {
        val t = Tables.events(s, d).select(col("user_id").as("u"),
          expr("unix_micros(ts)").as("t"), col("event_id").as("eid"),
          col("event_type").as("ch"))
        val w = Window.partitionBy(col("u"))
        t.withColumn("rn", row_number().over(
            w.orderBy(col("t"), col("eid"))).cast("long"))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("credit_e6",
            when(col("n") === 1, 1000000L)
              .when(col("n") === 2, 500000L)
              .when(col("rn") === 1 || col("rn") === col("n"), 400000L)
              .otherwise(expr("200000 div (n - 2)")))
          .groupBy(col("ch"))
          .agg(count(lit(1)).as("n_touches"),
            sum(col("credit_e6")).as("credit_e6"))
      },
      Some("""WITH t AS (
             |  SELECT user_id AS u, epoch_us(ts) AS t, event_id AS eid,
             |         event_type AS ch
             |  FROM events),
             |r AS (SELECT ch,
             |             CAST(row_number() OVER (PARTITION BY u
             |               ORDER BY t, eid) AS BIGINT) AS rn,
             |             CAST(count(*) OVER (PARTITION BY u) AS BIGINT) AS n
             |      FROM t),
             |c AS (SELECT ch,
             |             CASE WHEN n = 1 THEN 1000000
             |                  WHEN n = 2 THEN 500000
             |                  WHEN rn = 1 OR rn = n THEN 400000
             |                  ELSE 200000 // (n - 2) END AS credit_e6
             |      FROM r)
             |SELECT ch, CAST(count(*) AS BIGINT) AS n_touches,
             |       CAST(sum(credit_e6) AS BIGINT) AS credit_e6
             |FROM c GROUP BY 1""".stripMargin))
  )
}
