package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Experiment, Outlier, Pareto}
import org.apache.spark.sql.functions._

/** Round-56 batch: Local Outlier Factor (the density-ratio embedding-QA
  * sweep the dedup/ANN family lacks — q_dbscan_classify finds clusters,
  * LOF ranks the points no cluster wants), propensity-stratified ATE
  * (the observational-causal complement of q_diff_in_diff / q_cuped),
  * and Kneedle knee detection on the brand concentration curve (the
  * data-driven operating point q_abc_pareto's fixed 80/95 cuts guess).
  */
object Round56Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── LOF k=5 within each label block, top-10 outliers per label.
    QueryDef("q_lof",
      (s, d) => Outlier.lofWithinLabel(Tables.embeddings(s, d), 5, 10),
      Some("""WITH q AS MATERIALIZED (
             |  SELECT vec_id, CAST(label AS BIGINT) AS label,
             |         list_transform(CAST(embedding AS DOUBLE[]),
             |           x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
             |  FROM embeddings),
             |knn AS MATERIALIZED (
             |  SELECT * FROM (
             |    SELECT a.label, a.vec_id AS ia, b.vec_id AS ib,
             |           CAST(list_sum(list_transform(
             |             generate_series(1, len(a.qv)),
             |             i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])))
             |             AS BIGINT) AS d2,
             |           row_number() OVER (PARTITION BY a.vec_id
             |             ORDER BY list_sum(list_transform(
             |               generate_series(1, len(a.qv)),
             |               i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i]))),
             |               b.vec_id) AS rk
             |    FROM q a JOIN q b
             |      ON a.label = b.label AND a.vec_id <> b.vec_id)
             |  WHERE rk <= 5),
             |kd AS (SELECT ia, CAST(max(d2) AS BIGINT) AS kdist
             |       FROM knn GROUP BY 1),
             |sr AS (SELECT k.label, k.ia,
             |              greatest(CAST(sum(greatest(kb.kdist, k.d2))
             |                AS BIGINT), 200000) AS sreach
             |       FROM knn k JOIN kd kb ON k.ib = kb.ia
             |       GROUP BY 1, 2),
             |inv AS (SELECT ia AS ib,
             |               CAST(CAST('1000000000000000000000000' AS HUGEINT)
             |                 // CAST(sreach AS HUGEINT) AS BIGINT) AS inv_b
             |        FROM sr),
             |si AS (SELECT k.ia, CAST(sum(i.inv_b) AS BIGINT) AS sinv
             |       FROM knn k JOIN inv i ON k.ib = i.ib GROUP BY 1),
             |lof AS (SELECT sr.label, sr.ia AS vec_id, kd.kdist AS kdist_e12,
             |               CAST(CAST(sr.sreach AS HUGEINT)
             |                 * CAST(si.sinv AS HUGEINT)
             |                 // CAST('5000000000000000000' AS HUGEINT)
             |                 AS BIGINT) AS lof_e6
             |        FROM sr JOIN si ON sr.ia = si.ia
             |             JOIN kd ON sr.ia = kd.ia)
             |SELECT label, vec_id, kdist_e12, lof_e6 FROM (
             |  SELECT *, row_number() OVER (PARTITION BY label
             |    ORDER BY lof_e6 DESC, vec_id) AS pick FROM lof)
             |WHERE pick <= 10""".stripMargin)),

    // ── Stratified ATE: treatment = custkey % 3 = 0, outcome = total
    //    order spend (cents), strata = fixed-width balance bands.
    QueryDef("q_stratified_ate",
      (s, d) => {
        val spend = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("spend"))
        val units = Tables.customer(s, d)
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .select(
            least(lit(4L), greatest(lit(0L),
              expr("(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000)" +
                " div 220000"))).as("stratum"),
            (col("c_custkey") % 3 === 0).as("t"),
            coalesce(col("spend"), lit(0L)).as("y"))
        Experiment.stratifiedAte(units, "stratum", "t", "y")
      },
      Some("""WITH spend AS (
             |  SELECT o_custkey, CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS spend
             |  FROM orders GROUP BY 1),
             |units AS (
             |  SELECT least(4, greatest(0,
             |           (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
             |            + 100000) // 220000)) AS stratum,
             |         c_custkey % 3 = 0 AS t,
             |         coalesce(spend, 0) AS y
             |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
             |cells AS (
             |  SELECT stratum,
             |         CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             |         CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
             |         CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS s_t,
             |         CAST(sum(CASE WHEN t THEN 0 ELSE y END) AS BIGINT) AS s_c
             |  FROM units GROUP BY 1),
             |kept AS (SELECT stratum, n_t + n_c AS n_s, n_t, n_c,
             |                s_t // n_t AS mean_t_cents,
             |                s_c // n_c AS mean_c_cents,
             |                s_t // n_t - s_c // n_c AS diff_cents
             |         FROM cells WHERE n_t > 0 AND n_c > 0),
             |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n,
             |               CAST(sum(n_s * diff_cents) AS BIGINT) AS num
             |        FROM kept)
             |SELECT stratum, n_s, n_t, n_c, mean_t_cents, mean_c_cents,
             |       diff_cents, n_s * 1000000 // n AS w_e6,
             |       (num + n * 10000000) // n - 10000000 AS ate_cents
             |FROM kept CROSS JOIN tot""".stripMargin)),

    // ── Kneedle knee of the brand revenue concentration curve.
    QueryDef("q_knee_detection",
      (s, d) => Pareto.kneedle(
        Tables.lineitem(s, d)
          .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("rev")),
        "p_brand", "rev"),
      Some("""WITH per AS (
             |  SELECT p_brand AS k,
             |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS v
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1),
             |c AS (SELECT k, v,
             |             CAST(row_number() OVER (ORDER BY v DESC, k)
             |               AS BIGINT) AS r,
             |             CAST(sum(v) OVER (ORDER BY v DESC, k
             |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             |             CAST(count(*) OVER () AS BIGINT) AS n,
             |             CAST(sum(v) OVER () AS BIGINT) AS tot
             |      FROM per),
             |g AS (SELECT k, r, n, r * 1000000 // n AS x_e6,
             |             cum * 1000000 // tot AS y_e6
             |      FROM c)
             |SELECT n AS n_points, r AS knee_rank, k AS knee_key,
             |       x_e6 AS knee_x_e6, y_e6 AS knee_y_e6,
             |       y_e6 - x_e6 AS knee_gap_e6
             |FROM g ORDER BY y_e6 - x_e6 DESC, r LIMIT 1""".stripMargin))
  )
}
