package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-119 batch: Wald–Wolfowitz 2-sample runs (the distribution-
  * free "are these two series interleaved or segregated" screen),
  * the paired sign test on year-over-year monthly volumes (the
  * assumption-free cousin of q_wilcoxon_signed), and a Matryoshka
  * recall audit — how much of full-precision top-k survives when
  * retrieval uses only the embedding's 8-dim prefix (the
  * dimension-truncation trade modern embedding models are trained
  * for). Fixed-point e6 quantization keeps every dot product integer-
  * exact (sums stay < 2⁵³, so even a double-typed engine is exact).
  */
object Round119Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Wald–Wolfowitz runs across the pooled priority-1/2 monthly
    //    series: pooled deterministic sort (x, g, mo), runs = 1 + group
    //    changes via lag; exact null moments E[R] = 2nm/N + 1,
    //    Var = 2nm(2nm−N)/(N²(N−1)); z closes in a fixed IEEE tree.
    QueryDef("q_wald_wolfowitz",
      (s, d) => {
        val cell = Tables.orders(s, d)
          .filter(substring(col("o_orderpriority"), 1, 1).isin("1", "2"))
          .groupBy(substring(col("o_orderpriority"), 1, 1).as("g"),
            expr("year(o_orderdate) * 100 + month(o_orderdate)").as("mo"))
          .agg(count(lit(1)).as("x"))
        val w = Window.orderBy(col("x"), col("g"), col("mo"))
        cell
          .withColumn("pg", lag(col("g"), 1).over(w))
          .agg(count(lit(1)).as("nn"),
            sum(when(col("g") === "1", 1L).otherwise(0L)).as("n1"),
            sum(when(col("pg").isNull || col("pg") =!= col("g"), 1L)
              .otherwise(0L)).as("runs"))
          .selectExpr("CAST(runs AS BIGINT) AS runs",
            "CAST(n1 AS BIGINT) AS n",
            "nn - n1 AS m",
            "2 * n1 * (nn - n1) * 1000000 div nn + 1000000 AS er_e6",
            """round((CAST(runs AS DOUBLE)
              |       - (CAST(2 * n1 * (nn - n1) AS DOUBLE)
              |          / CAST(nn AS DOUBLE) + CAST('1.0' AS DOUBLE)))
              |     / sqrt(CAST(2 * n1 * (nn - n1) AS DOUBLE)
              |            * CAST(2 * n1 * (nn - n1) - nn AS DOUBLE)
              |            / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
              |               * CAST(nn - 1 AS DOUBLE))), 6) AS z"""
              .stripMargin)
      },
      Some("""WITH cell AS (SELECT substring(o_orderpriority, 1, 1) AS g,
             |                    year(o_orderdate) * 100
             |                      + month(o_orderdate) AS mo,
             |                    CAST(count(*) AS BIGINT) AS x
             |             FROM orders
             |             WHERE substring(o_orderpriority, 1, 1)
             |                     IN ('1', '2')
             |             GROUP BY 1, 2),
             |sq AS (SELECT g, lag(g) OVER (ORDER BY x, g, mo) AS pg
             |       FROM cell),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS nn,
             |             CAST(sum(CASE WHEN g = '1' THEN 1 ELSE 0 END)
             |               AS BIGINT) AS n1,
             |             CAST(sum(CASE WHEN pg IS NULL OR pg <> g
             |                           THEN 1 ELSE 0 END) AS BIGINT)
             |               AS runs
             |      FROM sq)
             |SELECT runs, n1 AS n, nn - n1 AS m,
             |       2 * n1 * (nn - n1) * 1000000 // nn + 1000000 AS er_e6,
             |       round((CAST(runs AS DOUBLE)
             |              - (CAST(2 * n1 * (nn - n1) AS DOUBLE)
             |                 / CAST(nn AS DOUBLE)
             |                 + CAST('1.0' AS DOUBLE)))
             |            / sqrt(CAST(2 * n1 * (nn - n1) AS DOUBLE)
             |                   * CAST(2 * n1 * (nn - n1) - nn AS DOUBLE)
             |                   / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
             |                      * CAST(nn - 1 AS DOUBLE))), 6) AS z
             |FROM t""".stripMargin)),

    // ── Paired sign test: 1997 vs 1996 order volume by calendar month
    //    (12 natural pairs). n⁺/n⁻ exact; the continuity-corrected z
    //    uses the binomial null — |n⁺ − n⁻| − 1 over √(n⁺+n⁻) — a
    //    fixed scalar close. Zero-difference months drop (the sign-test
    //    convention), matching q_wilcoxon_signed's pairing.
    QueryDef("q_sign_test",
      (s, d) => {
        val ym = Tables.orders(s, d)
          .filter(expr("year(o_orderdate) IN (1996, 1997)"))
          .groupBy(month(col("o_orderdate")).as("m"),
            year(col("o_orderdate")).as("y"))
          .agg(count(lit(1)).as("x"))
        val a = ym.filter(col("y") === 1996)
          .select(col("m"), col("x").as("xa"))
        val b = ym.filter(col("y") === 1997)
          .select(col("m"), col("x").as("xb"))
        a.join(b, "m").filter(col("xa") =!= col("xb"))
          .agg(sum(when(col("xb") > col("xa"), 1L).otherwise(0L))
            .as("n_plus"),
            sum(when(col("xb") < col("xa"), 1L).otherwise(0L))
              .as("n_minus"))
          .selectExpr("CAST(n_plus AS BIGINT) AS n_plus",
            "CAST(n_minus AS BIGINT) AS n_minus",
            """CASE WHEN n_plus + n_minus = 0 THEN CAST('0.0' AS DOUBLE)
              |ELSE round((CAST(abs(n_plus - n_minus) AS DOUBLE)
              |            - CAST('1.0' AS DOUBLE))
              |     / sqrt(CAST(n_plus + n_minus AS DOUBLE)), 6)
              |END AS z""".stripMargin)
      },
      Some("""WITH ym AS (SELECT month(o_orderdate) AS m,
             |                  year(o_orderdate) AS y,
             |                  CAST(count(*) AS BIGINT) AS x
             |           FROM orders
             |           WHERE year(o_orderdate) IN (1996, 1997)
             |           GROUP BY 1, 2),
             |p AS (SELECT a.m, a.x AS xa, b.x AS xb
             |      FROM (SELECT m, x FROM ym WHERE y = 1996) a
             |      JOIN (SELECT m, x FROM ym WHERE y = 1997) b
             |        ON a.m = b.m
             |      WHERE a.x <> b.x),
             |t AS (SELECT CAST(sum(CASE WHEN xb > xa THEN 1 ELSE 0 END)
             |               AS BIGINT) AS n_plus,
             |             CAST(sum(CASE WHEN xb < xa THEN 1 ELSE 0 END)
             |               AS BIGINT) AS n_minus
             |      FROM p)
             |SELECT n_plus, n_minus,
             |       CASE WHEN n_plus + n_minus = 0
             |            THEN CAST('0.0' AS DOUBLE)
             |            ELSE round((CAST(abs(n_plus - n_minus) AS DOUBLE)
             |                        - CAST('1.0' AS DOUBLE))
             |                 / sqrt(CAST(n_plus + n_minus AS DOUBLE)), 6)
             |       END AS z
             |FROM t""".stripMargin)),

    // ── Matryoshka recall: per query (vec_id < 16), overlap between
    //    cosine top-10 under the full 64-dim embedding and under its
    //    8-dim prefix. Dot products are e6-quantized integer sums
    //    (< 2⁵³ — exact even through a double accumulator); cosine
    //    rounds to 6 dp before ranking so tie order (cos desc, vec_id)
    //    is engine-identical. Query side broadcasts; the corpus never
    //    shuffles until the tiny per-query top-k rollup.
    QueryDef("q_matryoshka_recall",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"),
            expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
              "x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))").as("v"))
        val q = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val scored = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("dot_f", expr(
            """aggregate(zip_with(v, qv, (x, y) -> x * y), 0L,
              |(acc, t) -> acc + t)""".stripMargin))
          .withColumn("dot_p", expr(
            """aggregate(zip_with(slice(v, 1, 8), slice(qv, 1, 8),
              |(x, y) -> x * y), 0L, (acc, t) -> acc + t)""".stripMargin))
          .withColumn("n_c", expr(
            """aggregate(zip_with(v, v, (x, y) -> x * y), 0L,
              |(acc, t) -> acc + t)""".stripMargin))
          .withColumn("n_cp", expr(
            """aggregate(zip_with(slice(v, 1, 8), slice(v, 1, 8),
              |(x, y) -> x * y), 0L, (acc, t) -> acc + t)""".stripMargin))
          .withColumn("n_q", expr(
            """aggregate(zip_with(qv, qv, (x, y) -> x * y), 0L,
              |(acc, t) -> acc + t)""".stripMargin))
          .withColumn("n_qp", expr(
            """aggregate(zip_with(slice(qv, 1, 8), slice(qv, 1, 8),
              |(x, y) -> x * y), 0L, (acc, t) -> acc + t)""".stripMargin))
          .withColumn("cos_f", expr(
            """round(CAST(dot_f AS DOUBLE)
              |/ sqrt(CAST(n_c AS DOUBLE) * CAST(n_q AS DOUBLE)), 6)"""
              .stripMargin))
          .withColumn("cos_p", expr(
            """CASE WHEN n_cp = 0 OR n_qp = 0 THEN CAST('-2.0' AS DOUBLE)
              |ELSE round(CAST(dot_p AS DOUBLE)
              |/ sqrt(CAST(n_cp AS DOUBLE) * CAST(n_qp AS DOUBLE)), 6)
              |END""".stripMargin))
          .withColumn("rk_f", row_number().over(
            Window.partitionBy(col("q_id"))
              .orderBy(col("cos_f").desc, col("vec_id"))))
          .withColumn("rk_p", row_number().over(
            Window.partitionBy(col("q_id"))
              .orderBy(col("cos_p").desc, col("vec_id"))))
        scored.groupBy(col("q_id"))
          .agg(sum(when(col("rk_f") <= 10 && col("rk_p") <= 10, 1L)
            .otherwise(0L)).as("n_overlap"))
          .selectExpr("CAST(q_id AS BIGINT) AS q_id",
            "CAST(n_overlap AS BIGINT) AS n_overlap",
            "n_overlap * 1000000 div 10 AS recall_e6")
      },
      Some("""WITH e AS (SELECT vec_id,
             |                 list_transform(CAST(embedding AS DOUBLE[]),
             |                   x -> CAST(floor(x * 1000000 + 0.5)
             |                        AS BIGINT)) AS v
             |          FROM embeddings),
             |q AS (SELECT vec_id AS q_id, v AS qv FROM e
             |      WHERE vec_id < 16),
             |sc AS (SELECT e.vec_id, q.q_id,
             |              CAST(list_dot_product(e.v, q.qv) AS BIGINT)
             |                AS dot_f,
             |              CAST(list_dot_product(e.v[1:8], q.qv[1:8])
             |                AS BIGINT) AS dot_p,
             |              CAST(list_dot_product(e.v, e.v) AS BIGINT)
             |                AS n_c,
             |              CAST(list_dot_product(e.v[1:8], e.v[1:8])
             |                AS BIGINT) AS n_cp,
             |              CAST(list_dot_product(q.qv, q.qv) AS BIGINT)
             |                AS n_q,
             |              CAST(list_dot_product(q.qv[1:8], q.qv[1:8])
             |                AS BIGINT) AS n_qp
             |       FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
             |cs AS (SELECT q_id, vec_id,
             |              round(CAST(dot_f AS DOUBLE)
             |                / sqrt(CAST(n_c AS DOUBLE)
             |                       * CAST(n_q AS DOUBLE)), 6) AS cos_f,
             |              CASE WHEN n_cp = 0 OR n_qp = 0
             |                   THEN CAST('-2.0' AS DOUBLE)
             |                   ELSE round(CAST(dot_p AS DOUBLE)
             |                     / sqrt(CAST(n_cp AS DOUBLE)
             |                            * CAST(n_qp AS DOUBLE)), 6)
             |              END AS cos_p
             |       FROM sc),
             |rk AS (SELECT q_id,
             |              row_number() OVER (PARTITION BY q_id
             |                ORDER BY cos_f DESC, vec_id) AS rk_f,
             |              row_number() OVER (PARTITION BY q_id
             |                ORDER BY cos_p DESC, vec_id) AS rk_p
             |       FROM cs)
             |SELECT CAST(q_id AS BIGINT) AS q_id,
             |       CAST(sum(CASE WHEN rk_f <= 10 AND rk_p <= 10
             |                     THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_overlap,
             |       CAST(sum(CASE WHEN rk_f <= 10 AND rk_p <= 10
             |                     THEN 1 ELSE 0 END) AS BIGINT)
             |         * 1000000 // 10 AS recall_e6
             |FROM rk GROUP BY 1""".stripMargin))
  )
}
