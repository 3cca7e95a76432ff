package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Viterbi
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-163: FULL Viterbi path decode (`q_viterbi_path`) — the
  * per-position regime sequence, not just the end score. Sequential
  * backtracking is useless on a cluster; instead the max-plus PREFIX
  * scan gives forward scores f_d = v0 ⊗ (M_1⊗…⊗M_d) and the SUFFIX
  * scan gives best-completion scores b_d (row maxes of M_{d+1}⊗…),
  * both in ⌈log₂ T⌉ self-joins of the bounded time axis
  * ([[Viterbi.scanMaxPlus]]); the decoded state at every position is
  * argmax_s f_d[s]+b_d[s] (max-marginal decoding; ties → state 0 in
  * BOTH engines), and f+b is the SAME global optimum at every position
  * — emitted as a built-in consistency column. The oracle computes the
  * identical forward and backward recursions sequentially (two
  * recursive CTEs), so the scan algebra is checked against the
  * textbook definition day by day.
  */
object Round163Queries {

  private val T00 = -152003L; private val T01 = -3321928L
  private val T10 = -1736966L; private val T11 = -514573L
  private val E00 = -321928L; private val E01 = -2321928L
  private val E10 = -2000000L; private val E11 = -415037L
  private val PI = -1000000L

  def defs: Seq[QueryDef] = Seq(

    QueryDef("q_viterbi_path",
      (s, d) => {
        val daily = Tables.events(s, d)
          .selectExpr("unix_micros(ts) div 86400000000 AS day")
          .groupBy(col("day")).agg(count(lit(1)).as("n"))
        val tot = daily.agg(expr("sum(n) div count(1)").as("mean_n"))
        val obs = daily.crossJoin(broadcast(tot))
          .withColumn("o", (col("n") > col("mean_n")).cast("long"))
          .withColumn("idx", row_number().over(Window.orderBy(col("day"))) - 1)
          .select(col("idx"), col("o"))
          .localCheckpoint(false)
        val mats = obs.filter(col("idx") > 0)
          .selectExpr("idx",
            s"CASE WHEN o = 0 THEN ${T00 + E00}L ELSE ${T00 + E01}L END AS m00",
            s"CASE WHEN o = 0 THEN ${T01 + E10}L ELSE ${T01 + E11}L END AS m01",
            s"CASE WHEN o = 0 THEN ${T10 + E00}L ELSE ${T10 + E01}L END AS m10",
            s"CASE WHEN o = 0 THEN ${T11 + E10}L ELSE ${T11 + E11}L END AS m11")
        val pfx = Viterbi.scanMaxPlus(mats, forward = true)
          .selectExpr("idx", "m00 AS p00", "m01 AS p01", "m10 AS p10",
            "m11 AS p11")
        val sfx = Viterbi.scanMaxPlus(mats, forward = false)
          .selectExpr("idx - 1 AS idx", "greatest(m00, m01) AS bw0",
            "greatest(m10, m11) AS bw1") // completion FROM day idx
        val v0 = obs.filter(col("idx") === 0)
          .selectExpr(
            s"CASE WHEN o = 0 THEN ${PI + E00}L ELSE ${PI + E01}L END AS v00",
            s"CASE WHEN o = 0 THEN ${PI + E10}L ELSE ${PI + E11}L END AS v01")
        obs.join(broadcast(pfx), Seq("idx"), "left")
          .join(broadcast(sfx), Seq("idx"), "left")
          .crossJoin(broadcast(v0))
          // f_d: day 0 is v0 itself (no prefix row); b_d: last day has
          // no suffix row -> identity completion (0)
          .selectExpr("idx", "o",
            "CASE WHEN p00 IS NULL THEN v00 ELSE greatest(v00 + p00, v01 + p10) END AS f0",
            "CASE WHEN p00 IS NULL THEN v01 ELSE greatest(v00 + p01, v01 + p11) END AS f1",
            "coalesce(bw0, 0L) AS b0", "coalesce(bw1, 0L) AS b1")
          .selectExpr("idx AS day_idx", "o AS obs_high",
            "CASE WHEN f0 + b0 >= f1 + b1 THEN 0L ELSE 1L END AS state",
            "greatest(f0 + b0, f1 + b1) AS path_score_e6")
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
              |mx AS (SELECT CAST(max(idx) AS BIGINT) AS t_last FROM obs),
              |fwd AS (
              |  SELECT 0 AS d,
              |         CASE WHEN o = 0 THEN $PI + $E00
              |              ELSE $PI + $E01 END AS f0,
              |         CASE WHEN o = 0 THEN $PI + $E10
              |              ELSE $PI + $E11 END AS f1
              |  FROM obs WHERE idx = 0
              |  UNION ALL
              |  SELECT fwd.d + 1,
              |         greatest(fwd.f0 + $T00, fwd.f1 + $T10)
              |           + CASE WHEN obs.o = 0 THEN $E00 ELSE $E01 END,
              |         greatest(fwd.f0 + $T01, fwd.f1 + $T11)
              |           + CASE WHEN obs.o = 0 THEN $E10 ELSE $E11 END
              |  FROM fwd JOIN obs ON obs.idx = fwd.d + 1),
              |bwd AS (
              |  SELECT t_last AS d, CAST(0 AS BIGINT) AS b0,
              |         CAST(0 AS BIGINT) AS b1
              |  FROM mx
              |  UNION ALL
              |  SELECT bwd.d - 1,
              |         greatest($T00 + CASE WHEN obs.o = 0 THEN $E00
              |             ELSE $E01 END + bwd.b0,
              |           $T01 + CASE WHEN obs.o = 0 THEN $E10
              |             ELSE $E11 END + bwd.b1),
              |         greatest($T10 + CASE WHEN obs.o = 0 THEN $E00
              |             ELSE $E01 END + bwd.b0,
              |           $T11 + CASE WHEN obs.o = 0 THEN $E10
              |             ELSE $E11 END + bwd.b1)
              |  FROM bwd JOIN obs ON obs.idx = bwd.d WHERE bwd.d > 0)
              |SELECT obs.idx AS day_idx, CAST(obs.o AS BIGINT) AS obs_high,
              |       CAST(CASE WHEN fwd.f0 + bwd.b0 >= fwd.f1 + bwd.b1
              |         THEN 0 ELSE 1 END AS BIGINT) AS state,
              |       CAST(greatest(fwd.f0 + bwd.b0, fwd.f1 + bwd.b1)
              |         AS BIGINT) AS path_score_e6
              |FROM obs JOIN fwd ON fwd.d = obs.idx
              |JOIN bwd ON bwd.d = obs.idx"""
        .stripMargin.replaceFirst("WITH ", "WITH RECURSIVE ")))
  )
}
