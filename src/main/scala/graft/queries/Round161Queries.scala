package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Similarity, Viterbi}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-161 batch:
  *
  *  - Viterbi regime decode (`q_viterbi_maxplus`): 2-state HMM over the
  *    daily high/low-traffic observation sequence, decoded by
  *    [[graft.ops.Viterbi]]'s max-plus doubling — ⌈log₂ T⌉ keyed
  *    aggregates instead of T sequential steps. The oracle runs the
  *    textbook recursion (recursive CTE carrying both state scores as
  *    columns), so the reduction's algebra is proven against the
  *    sequential definition on every run.
  *  - Agglomerative merge step (`q_agglo_merge`): one single-linkage
  *    round over nation-level customer centroids — closest centroid
  *    pair (squared integer distance, tie → smaller pair) merges into
  *    its size-weighted mean; 24 clusters out. The bounded-axis
  *    induction step of hierarchical clustering (k² candidate pairs on
  *    a 25-row axis — the fact scan happens once, in the rollup).
  *  - Dunn-style separation index (`q_dunn_index`): min inter-centroid
  *    squared distance over max point-to-own-centroid squared distance
  *    for the labeled embeddings — completes the internal-validity
  *    quartet (silhouette, Davies–Bouldin, Calinski–Harabasz, Dunn).
  *    Same exact 4dp-integer grid as q_calinski_harabasz.
  */
object Round161Queries {

  // 2-state HMM parameters, log2-prob e6 (fixed literals both engines):
  // T = [[0.9, 0.1], [0.3, 0.7]], E[s=0] = [0.8, 0.2], E[s=1] = [0.25,
  // 0.75], pi = [0.5, 0.5].
  private val T00 = -152003L; private val T01 = -3321928L
  private val T10 = -1736966L; private val T11 = -514573L
  private val E00 = -321928L; private val E01 = -2321928L
  private val E10 = -2000000L; private val E11 = -415037L
  private val PI = -1000000L

  def defs: Seq[QueryDef] = Seq(

    // ── Viterbi: obs o_d = (day count > integer mean); day axis dense
    //    re-indexed; M_d[s',s] = T[s'][s] + E[s][o_d] for d ≥ 1; answer
    //    = max over end states of (v0 ⊗ M_1 ⊗ … ⊗ M_{T−1}).
    QueryDef("q_viterbi_maxplus",
      (s, d) => {
        val daily = Tables.events(s, d)
          .selectExpr("unix_micros(ts) div 86400000000 AS day")
          .groupBy(col("day")).agg(count(lit(1)).as("n"))
        val tot = daily.agg(expr("sum(n) div count(1)").as("mean_n"))
        val obs = daily.crossJoin(broadcast(tot))
          .withColumn("o", (col("n") > col("mean_n")).cast("long"))
          .withColumn("idx", row_number().over(Window.orderBy(col("day"))) - 1)
          .select(col("idx"), col("o"))
          .localCheckpoint(false) // bounded day axis, feeds v0 AND chain
        val mats = obs.filter(col("idx") > 0)
          .selectExpr("idx - 1 AS idx",
            s"CASE WHEN o = 0 THEN ${T00 + E00}L ELSE ${T00 + E01}L END AS m00",
            s"CASE WHEN o = 0 THEN ${T01 + E10}L ELSE ${T01 + E11}L END AS m01",
            s"CASE WHEN o = 0 THEN ${T10 + E00}L ELSE ${T10 + E01}L END AS m10",
            s"CASE WHEN o = 0 THEN ${T11 + E10}L ELSE ${T11 + E11}L END AS m11")
        val p = Viterbi.reduceMaxPlus(mats)
        val v0 = obs.filter(col("idx") === 0)
          .selectExpr(
            s"CASE WHEN o = 0 THEN ${PI + E00}L ELSE ${PI + E01}L END AS v00",
            s"CASE WHEN o = 0 THEN ${PI + E10}L ELSE ${PI + E11}L END AS v01")
        val nd = obs.agg(count(lit(1)).as("n_days"))
        v0.crossJoin(broadcast(p)).crossJoin(broadcast(nd))
          .selectExpr("CAST(n_days AS BIGINT) AS n_days",
            "greatest(v00 + m00, v01 + m10) AS v_end0",
            "greatest(v00 + m01, v01 + m11) AS v_end1")
          .selectExpr("n_days", "v_end0", "v_end1",
            "CASE WHEN v_end0 >= v_end1 THEN 0L ELSE 1L END AS best_state",
            "greatest(v_end0, v_end1) AS best_logp_e6")
      },
      Some(s"""WITH daily AS (
              |  SELECT epoch_us(ts) // 86400000000 AS day,
              |         CAST(count(*) AS BIGINT) AS n
              |  FROM events GROUP BY 1),
              |tot AS (SELECT CAST(sum(n) AS BIGINT) // count(*) AS mean_n
              |        FROM daily),
              |obs AS (SELECT row_number() OVER (ORDER BY day) - 1 AS idx,
              |               CASE WHEN n > mean_n THEN 1 ELSE 0 END AS o
              |        FROM daily CROSS JOIN tot),
              |dp AS (
              |  SELECT 0 AS d,
              |         CASE WHEN o = 0 THEN $PI + $E00
              |              ELSE $PI + $E01 END AS v0,
              |         CASE WHEN o = 0 THEN $PI + $E10
              |              ELSE $PI + $E11 END AS v1
              |  FROM obs WHERE idx = 0
              |  UNION ALL
              |  SELECT dp.d + 1,
              |         greatest(dp.v0 + $T00, dp.v1 + $T10)
              |           + CASE WHEN obs.o = 0 THEN $E00 ELSE $E01 END,
              |         greatest(dp.v0 + $T01, dp.v1 + $T11)
              |           + CASE WHEN obs.o = 0 THEN $E10 ELSE $E11 END
              |  FROM dp JOIN obs ON obs.idx = dp.d + 1),
              |fin AS (SELECT v0 AS v_end0, v1 AS v_end1 FROM dp
              |        WHERE d = (SELECT max(idx) FROM obs)),
              |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM obs)
              |SELECT n_days, CAST(v_end0 AS BIGINT) AS v_end0,
              |       CAST(v_end1 AS BIGINT) AS v_end1,
              |       CAST(CASE WHEN v_end0 >= v_end1 THEN 0 ELSE 1 END
              |         AS BIGINT) AS best_state,
              |       CAST(greatest(v_end0, v_end1) AS BIGINT)
              |         AS best_logp_e6
              |FROM fin CROSS JOIN nd"""
        .stripMargin.replaceFirst("WITH ", "WITH RECURSIVE "))),

    // ── One agglomerative (single-linkage) merge over nation centroids
    //    on (avg acctbal dollars, customers-per-nation): the closest
    //    pair by squared distance merges size-weighted; ties break on
    //    (a, b) nation-key order. Output: 24 surviving clusters.
    QueryDef("q_agglo_merge",
      (s, d) => {
        val cent = Tables.customer(s, d)
          .groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("sz"),
            expr("CAST(sum(floor(c_acctbal)) AS BIGINT) div count(1)")
              .as("x"))
          .localCheckpoint(false) // 25-row axis: pairs AND output share it
        val pairs = cent.as("a").join(cent.as("b"),
            col("a.nk") < col("b.nk"))
          .selectExpr("a.nk AS an", "b.nk AS bn",
            "(a.x - b.x) * (a.x - b.x) + (a.sz - b.sz) * (a.sz - b.sz) AS d2")
        val best = pairs.withColumn("rk", row_number().over(
            Window.orderBy(col("d2"), col("an"), col("bn"))))
          .filter(col("rk") === 1)
          .selectExpr("an", "bn")
        val tagged = cent.crossJoin(broadcast(best))
        val merged = tagged.filter(col("nk") === col("an") ||
            col("nk") === col("bn"))
          .groupBy(col("an"))
          .agg(sum(col("sz")).as("sz"),
            expr("sum(x * sz) div sum(sz)").as("x"))
          .selectExpr("an AS cluster_id", "sz", "x", "2L AS n_members")
        tagged.filter(col("nk") =!= col("an") && col("nk") =!= col("bn"))
          .selectExpr("nk AS cluster_id", "sz", "x", "1L AS n_members")
          .unionByName(merged)
      },
      Some("""WITH cent AS (
             |  SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS sz,
             |         CAST(sum(floor(c_acctbal)) AS BIGINT) // count(*)
             |           AS x
             |  FROM customer GROUP BY 1),
             |pairs AS (SELECT a.nk AS an, b.nk AS bn,
             |                 (a.x - b.x) * (a.x - b.x)
             |                   + (a.sz - b.sz) * (a.sz - b.sz) AS d2
             |          FROM cent a JOIN cent b ON a.nk < b.nk),
             |best AS (SELECT an, bn FROM pairs
             |         QUALIFY row_number() OVER (ORDER BY d2, an, bn) = 1),
             |merged AS (SELECT b.an AS cluster_id,
             |                  CAST(sum(c.sz) AS BIGINT) AS sz,
             |                  CAST(sum(c.x * c.sz) AS BIGINT)
             |                    // CAST(sum(c.sz) AS BIGINT) AS x,
             |                  CAST(2 AS BIGINT) AS n_members
             |           FROM cent c CROSS JOIN best b
             |           WHERE c.nk = b.an OR c.nk = b.bn
             |           GROUP BY b.an)
             |SELECT c.nk AS cluster_id, c.sz, c.x,
             |       CAST(1 AS BIGINT) AS n_members
             |FROM cent c CROSS JOIN best b
             |WHERE c.nk <> b.an AND c.nk <> b.bn
             |UNION ALL SELECT * FROM merged""".stripMargin)),

    // ── Dunn-style index on the labeled embeddings (squared-distance
    //    form, exact 4dp-integer grid): min centroid separation over
    //    max point-to-own-centroid spread.
    QueryDef("q_dunn_index",
      (s, d) => {
        val el = Similarity.cast(Tables.embeddings(s, d))
          .select(col("vec_id"), col("label").cast("long").as("label"),
            posexplode(col("ev")).as(Seq("i", "v")))
          .selectExpr("vec_id", "label", "i",
            "CAST(round(v * 10000) AS BIGINT) AS v_e4")
          .localCheckpoint(false)
        val cent = el.groupBy(col("label"), col("i"))
          .agg(expr("sum(v_e4) div count(1)").as("c_e4"))
          .localCheckpoint(false)
        val inter = cent.as("a").join(cent.as("b"),
            col("a.i") === col("b.i") && col("a.label") < col("b.label"))
          .groupBy(col("a.label"), col("b.label"))
          .agg(sum(expr("(a.c_e4 - b.c_e4) * (a.c_e4 - b.c_e4)"))
            .as("d2_e8"))
          .agg(min(col("d2_e8")).as("min_inter_e8"))
        val intra = el.join(broadcast(cent), Seq("label", "i"))
          .groupBy(col("vec_id"))
          .agg(sum(expr("(v_e4 - c_e4) * (v_e4 - c_e4)")).as("d2_e8"))
          .agg(max(col("d2_e8")).as("max_intra_e8"),
            count(lit(1)).as("n"))
        inter.crossJoin(broadcast(intra))
          .selectExpr("CAST(n AS BIGINT) AS n_vecs",
            "min_inter_e8 div 100 AS min_inter_e6",
            "max_intra_e8 div 100 AS max_intra_e6",
            "min_inter_e8 * 1000000 div greatest(1L, max_intra_e8) AS dunn_e6")
      },
      Some("""WITH el AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
             |                  generate_subscripts(CAST(embedding AS
             |                    DOUBLE[]), 1) - 1 AS i,
             |                  CAST(round(unnest(CAST(embedding AS
             |                    DOUBLE[])) * 10000) AS BIGINT) AS v_e4
             |            FROM embeddings),
             |cent AS (SELECT label, i,
             |                CAST(sum(v_e4) AS BIGINT) // count(*) AS c_e4
             |         FROM el GROUP BY 1, 2),
             |inter AS (SELECT CAST(min(d2_e8) AS BIGINT) AS min_inter_e8
             |          FROM (SELECT a.label AS la, b.label AS lb,
             |                       CAST(sum((a.c_e4 - b.c_e4)
             |                         * (a.c_e4 - b.c_e4)) AS BIGINT)
             |                         AS d2_e8
             |                FROM cent a JOIN cent b
             |                  ON a.i = b.i AND a.label < b.label
             |                GROUP BY 1, 2)),
             |intra AS (SELECT CAST(max(d2_e8) AS BIGINT) AS max_intra_e8,
             |                 CAST(count(*) AS BIGINT) AS n
             |          FROM (SELECT el.vec_id,
             |                       CAST(sum((el.v_e4 - cent.c_e4)
             |                         * (el.v_e4 - cent.c_e4)) AS BIGINT)
             |                         AS d2_e8
             |                FROM el JOIN cent
             |                  ON el.label = cent.label AND el.i = cent.i
             |                GROUP BY el.vec_id))
             |SELECT n AS n_vecs, min_inter_e8 // 100 AS min_inter_e6,
             |       max_intra_e8 // 100 AS max_intra_e6,
             |       min_inter_e8 * 1000000 // greatest(1, max_intra_e8)
             |         AS dunn_e6
             |FROM inter CROSS JOIN intra""".stripMargin))
  )
}
