package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Pareto
import org.apache.spark.sql.functions._

/** Round-31 batch: ABC/Pareto revenue classification via the banded
  * distributed prefix sum (no global window).
  */
object Round31Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── ABC classes of parts by lineitem revenue: A while the exclusive
    //    cumulative share < 80%, B < 95%, else C.
    QueryDef("q_abc_pareto",
      (s, d) => Pareto.abcClasses(
        Tables.lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("cents")),
        "l_partkey", "cents"),
      Some("""WITH rev AS (
             |  SELECT l_partkey AS id,
             |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |                       AS BIGINT)) AS BIGINT) AS v
             |  FROM lineitem GROUP BY 1),
             |tot AS (SELECT CAST(sum(v) AS BIGINT) AS t FROM rev),
             |c AS (
             |  SELECT id, v,
             |         CAST(sum(v) OVER (ORDER BY v DESC, id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |           - v AS BIGINT) AS cum_excl
             |  FROM rev)
             |SELECT CASE WHEN cum_excl * 100 < 80 * t THEN 'A'
             |            WHEN cum_excl * 100 < 95 * t THEN 'B'
             |            ELSE 'C' END AS cls,
             |       CAST(count(*) AS BIGINT) AS n_items,
             |       CAST(sum(v) AS BIGINT) AS rev_cents,
             |       CAST((CAST(sum(v) AS HUGEINT) * 1000000) // max(t)
             |         AS BIGINT) AS share_e6
             |FROM c CROSS JOIN tot
             |GROUP BY 1""".stripMargin))
  )
}
