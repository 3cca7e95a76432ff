package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-132 batch: supply-chain service metrics over order→ship lead
  * times (ship lag = whole days between o_orderdate and l_shipdate; 90
  * days is the service cutoff throughout) — quantity fill rate per
  * brand (the service-level read beside q_sla_attainment's latency
  * SLA), supplier lead-time reliability (exact integer variance of lead
  * days — the vendor-scorecard ranking), and OTIF by order priority
  * (all-lines-on-time-in-full, the order-grain conjunction a
  * line-grain rate hides). Lead days are integer divs; every share is
  * an exact e6.
  */
object Round132Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Fill rate per brand: on-time (≤90-day) quantity share, e6.
    //    ONE lineitem×orders join (order side projected to the key +
    //    date), part dim broadcast; one brand rollup on the bounded
    //    brand axis.
    QueryDef("q_fill_rate",
      (s, d) => {
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"), col("l_quantity").cast("long").as("q"),
            expr("""(unix_micros(CAST(l_shipdate AS TIMESTAMP))
                   | - unix_micros(CAST(o_orderdate AS TIMESTAMP)))
                   |div 86400000000""".stripMargin).as("lead_days"))
          .groupBy(col("p_brand"))
          .agg(sum(col("q")).as("q_total"),
            sum(when(col("lead_days") <= 90, col("q")).otherwise(0L))
              .as("q_on_time"),
            count(lit(1)).as("n_lines"))
          .selectExpr("p_brand", "CAST(n_lines AS BIGINT) AS n_lines",
            "CAST(q_total AS BIGINT) AS q_total",
            "CAST(q_on_time AS BIGINT) AS q_on_time",
            "q_on_time * 1000000 div q_total AS fill_e6")
      },
      Some("""WITH t AS (
             |  SELECT p.p_brand, CAST(l.l_quantity AS BIGINT) AS q,
             |         (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
             |           // 86400000000 AS lead_days
             |  FROM lineitem l
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  JOIN part p ON l.l_partkey = p.p_partkey)
             |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
             |       CAST(sum(q) AS BIGINT) AS q_total,
             |       CAST(sum(CASE WHEN lead_days <= 90 THEN q ELSE 0
             |         END) AS BIGINT) AS q_on_time,
             |       CAST(sum(CASE WHEN lead_days <= 90 THEN q ELSE 0
             |         END) AS BIGINT) * 1000000
             |         // CAST(sum(q) AS BIGINT) AS fill_e6
             |FROM t GROUP BY 1""".stripMargin)),

    // ── Lead-time reliability: the 10 most variable suppliers by the
    //    exact population variance of lead days, e4 via the integer
    //    moment identity (n·Σd² − (Σd)²)·1e4 div n². Lead days ≤ ~200,
    //    so Σd² stays far inside int64 at any SF.
    QueryDef("q_lead_time_reliability",
      (s, d) => {
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey"),
            expr("""(unix_micros(CAST(l_shipdate AS TIMESTAMP))
                   | - unix_micros(CAST(o_orderdate AS TIMESTAMP)))
                   |div 86400000000""".stripMargin).as("dd"))
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n"), sum(col("dd")).as("sd"),
            sum(expr("dd * dd")).as("sdd"))
          .filter(col("n") >= 20)
          .withColumn("var_e4",
            expr("(n * sdd - sd * sd) * 10000 div (n * n)"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("var_e4").desc, col("l_suppkey"))))
          .filter(col("rk") <= 10)
          .selectExpr("l_suppkey AS suppkey", "CAST(n AS BIGINT) AS n",
            "sd div n AS mean_days", "var_e4",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH t AS (
             |  SELECT l_suppkey,
             |         (epoch_us(l_shipdate) - epoch_us(o_orderdate))
             |           // 86400000000 AS dd
             |  FROM lineitem l JOIN orders o
             |    ON l.l_orderkey = o.o_orderkey),
             |m AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(dd) AS BIGINT) AS sd,
             |             CAST(sum(dd * dd) AS BIGINT) AS sdd
             |      FROM t GROUP BY 1 HAVING count(*) >= 20)
             |SELECT l_suppkey AS suppkey, n, sd // n AS mean_days,
             |       var_e4, rk
             |FROM (SELECT *,
             |             (n * sdd - sd * sd) * 10000 // (n * n)
             |               AS var_e4,
             |             CAST(row_number() OVER (ORDER BY
             |               (n * sdd - sd * sd) * 10000 // (n * n) DESC,
             |               l_suppkey) AS BIGINT) AS rk
             |      FROM m)
             |WHERE rk <= 10""".stripMargin)),

    // ── OTIF by priority: an order counts only if EVERY line shipped
    //    within 90 days (max lead ≤ 90 — the conjunction as ONE keyed
    //    aggregate, no per-line EXISTS). Order rollup then the bounded
    //    priority axis.
    QueryDef("q_otif",
      (s, d) => {
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderdate"),
              col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderpriority"))
          .agg(max(expr("""(unix_micros(CAST(l_shipdate AS TIMESTAMP))
                          | - unix_micros(CAST(o_orderdate AS TIMESTAMP)))
                          |div 86400000000""".stripMargin)).as("max_lead"),
            count(lit(1)).as("n_lines"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("max_lead") <= 90, 1L).otherwise(0L))
              .as("n_otif"),
            sum(col("n_lines")).as("n_lines"))
          .selectExpr("o_orderpriority",
            "CAST(n_orders AS BIGINT) AS n_orders",
            "CAST(n_otif AS BIGINT) AS n_otif",
            "CAST(n_lines AS BIGINT) AS n_lines",
            "n_otif * 1000000 div n_orders AS otif_e6")
      },
      Some("""WITH o AS (
             |  SELECT l.l_orderkey, o.o_orderpriority,
             |         max((epoch_us(l.l_shipdate)
             |              - epoch_us(o.o_orderdate)) // 86400000000)
             |           AS max_lead,
             |         CAST(count(*) AS BIGINT) AS n_lines
             |  FROM lineitem l JOIN orders o
             |    ON l.l_orderkey = o.o_orderkey
             |  GROUP BY 1, 2)
             |SELECT o_orderpriority,
             |       CAST(count(*) AS BIGINT) AS n_orders,
             |       CAST(sum(CASE WHEN max_lead <= 90 THEN 1 ELSE 0
             |         END) AS BIGINT) AS n_otif,
             |       CAST(sum(n_lines) AS BIGINT) AS n_lines,
             |       CAST(sum(CASE WHEN max_lead <= 90 THEN 1 ELSE 0
             |         END) AS BIGINT) * 1000000 // count(*) AS otif_e6
             |FROM o GROUP BY 1""".stripMargin))
  )
}
