package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-178 batch — three compact profile reads:
  *
  *  - h-index (`q_h_index`): per supplier, the largest h such that h of
  *    their parts each shipped in ≥ h lineitems — the robust
  *    "productivity × impact" scalar (insensitive to one blockbuster
  *    part, unlike max; insensitive to a long tail, unlike count).
  *    One (supplier, part) rollup, a per-supplier rank window, one max.
  *  - Freeman centralization (`q_centralization`): how star-like the
  *    co-event graph is — Σ(c_max − c_i) normalized by the star
  *    graph's (n−1)(n−2), on degree centrality. The single-number
  *    companion to q_degree_hist / q_degree_entropy.
  *  - Price points (`q_price_points`): share of part retail prices
  *    landing on .00 / .99 / .95 / .50 cents vs the 1% uniform
  *    expectation each — the psychological-pricing screen of the
  *    Benford family, per price digit bucket with excess ratios e6.
  */
object Round178Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── h-index per supplier over part shipment counts.
    QueryDef("q_h_index",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        Tables.lineitem(s, d)
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(count(lit(1)).as("c"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("l_suppkey"))
              .orderBy(col("c").desc, col("l_partkey"))).cast("long"))
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n_parts"),
            sum(expr("CASE WHEN c >= rk THEN 1L ELSE 0L END"))
              .as("h_index"),
            max(col("c")).as("max_count"))
      },
      Some("""WITH pc AS (
             |  SELECT l_suppkey, l_partkey,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM lineitem GROUP BY 1, 2),
             |rk AS (SELECT l_suppkey, c,
             |         CAST(row_number() OVER (PARTITION BY l_suppkey
             |           ORDER BY c DESC, l_partkey) AS BIGINT) AS rk
             |       FROM pc)
             |SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_parts,
             |       CAST(sum(CASE WHEN c >= rk THEN 1 ELSE 0 END)
             |         AS BIGINT) AS h_index,
             |       max(c) AS max_count
             |FROM rk GROUP BY 1""".stripMargin)),

    // ── Freeman degree centralization of the co-event graph.
    QueryDef("q_centralization",
      (s, d) => {
        val e = Tables.events(s, d)
          .selectExpr("least(user_id % 500, event_id % 500) AS a",
            "greatest(user_id % 500, event_id % 500) AS b")
          .where(col("a") =!= col("b")).distinct()
        val deg = e.select(col("a").as("v"))
          .unionByName(e.select(col("b").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("deg"))
        val m = deg.agg(count(lit(1)).as("n"), max(col("deg")).as("mx"),
          sum(col("deg")).as("sd"))
        m.selectExpr("CAST(n AS BIGINT) AS n_vertices",
            "mx AS max_degree", "sd div n AS mean_degree",
            "n * mx - sd AS centralization_num",
            """CASE WHEN n <= 2 THEN NULL
              |ELSE (n * mx - sd) * 1000000
              |  div ((n - 1) * (n - 2)) END
              | AS centralization_e6""".stripMargin)
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT least(user_id % 500, event_id % 500)
             |           AS a,
             |         greatest(user_id % 500, event_id % 500) AS b
             |  FROM events WHERE user_id % 500 <> event_id % 500),
             |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg
             |        FROM (SELECT a AS v FROM e
             |              UNION ALL SELECT b FROM e)
             |        GROUP BY 1),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |             max(deg) AS mx,
             |             CAST(sum(deg) AS BIGINT) AS sd
             |      FROM deg)
             |SELECT n AS n_vertices, mx AS max_degree,
             |       sd // n AS mean_degree,
             |       n * mx - sd AS centralization_num,
             |       CASE WHEN n <= 2 THEN NULL
             |       ELSE (n * mx - sd) * 1000000
             |         // ((n - 1) * (n - 2)) END AS centralization_e6
             |FROM m""".stripMargin)),

    // ── Psychological price points vs the uniform 1%-per-cent rate.
    QueryDef("q_price_points",
      (s, d) => {
        val c = Tables.part(s, d)
          .selectExpr(
            "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) % 100" +
              " AS cents")
          .localCheckpoint(false) // bucket counts + total
        val tot = c.agg(count(lit(1)).as("n"))
        c.selectExpr(
            """CASE WHEN cents IN (0, 50, 95, 99)
              |  THEN CAST(cents AS STRING) ELSE 'other' END AS bucket"""
              .stripMargin)
          .groupBy(col("bucket")).agg(count(lit(1)).as("k"))
          .crossJoin(broadcast(tot))
          .selectExpr("bucket", "k", "n",
            "k * 1000000 div n AS share_e6",
            // uniform expectation: 1% per named cent, 96% for other
            """CASE WHEN bucket = 'other' THEN 960000L
              |ELSE 10000L END AS expected_e6""".stripMargin)
          .selectExpr("bucket", "k", "share_e6", "expected_e6",
            """CASE WHEN expected_e6 = 0 THEN NULL
              |ELSE share_e6 * 1000000 div expected_e6
              |END AS excess_ratio_e6""".stripMargin)
      },
      Some("""WITH c AS (
             |  SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
             |           % 100 AS cents
             |  FROM part),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
             |b AS (SELECT CASE WHEN cents IN (0, 50, 95, 99)
             |          THEN CAST(cents AS VARCHAR) ELSE 'other' END
             |          AS bucket,
             |        CAST(count(*) AS BIGINT) AS k
             |      FROM c GROUP BY 1),
             |j AS (SELECT bucket, k, n, k * 1000000 // n AS share_e6,
             |        CASE WHEN bucket = 'other' THEN 960000
             |        ELSE 10000 END AS expected_e6
             |      FROM b CROSS JOIN tot)
             |SELECT bucket, k, share_e6, expected_e6,
             |       CASE WHEN expected_e6 = 0 THEN NULL
             |       ELSE share_e6 * 1000000 // expected_e6
             |       END AS excess_ratio_e6
             |FROM j""".stripMargin))
  )
}
