package graft.queries

import graft.QueryDef
import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Round-92 batch: sampled-pivot betweenness — the §7.4k escape hatch
  * from q_betweenness's all-sources regime, exercised on a FIXED
  * deterministic seed set so the pair-sampling estimator itself is
  * oracle-checked (same layered-σ code path, BFS seeded only at the
  * pivots, pair sum rescaled by n(n−1)/(k(k−1))).
  */
object Round92Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Sampled betweenness: pivots = ids ≡ 0 (mod 7) (15 of 100 — a
    //    fixed, replayable "sample"); both pair endpoints range over the
    //    pivots, so bc_sampled is the exact sum over sampled ordered
    //    pairs and bc_est the unbiased full-graph rescale. At 100 TB the
    //    pivot predicate is the ONLY thing that changes — BFS state is
    //    k·|V| instead of |V|², the plan is identical.
    QueryDef("q_betweenness_sampled",
      (s, d) => {
        val (nodes, und) = Round16Queries.chainGraph(s, d)
        val adj = und.select(col("a").as("src"), col("b").as("dst"))
          .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
        val seeded = nodes.withColumn("is_pivot", col("id") % 7 === 0)
        val stats = seeded.agg(count(lit(1)).as("n"),
          sum(when(col("is_pivot"), 1L).otherwise(0L)).as("k"))
        Graph.betweenness(seeded, adj, 10, Some("is_pivot"))
          .crossJoin(broadcast(stats))
          .selectExpr("v", "bc_e6 AS bc_sampled_e6",
            "bc_e6 * (n * (n - 1)) div (k * (k - 1)) AS bc_est_e6")
      },
      Some("WITH RECURSIVE " + Round16Queries.chainGraphSql + ",\n" +
        Round16Queries.betweennessBodySql(8, "id % 7 = 0") +
        s""",
           |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |               CAST(sum(CASE WHEN id % 7 = 0 THEN 1 ELSE 0 END)
           |                 AS BIGINT) AS k
           |        FROM nodes)
           |SELECT CAST(n.id AS BIGINT) AS v,
           |       CAST(coalesce(bc.bc_e6, 0) AS BIGINT) AS bc_sampled_e6,
           |       CAST(coalesce(bc.bc_e6, 0) * (c.n * (c.n - 1))
           |         // (c.k * (c.k - 1)) AS BIGINT) AS bc_est_e6
           |FROM nodes n CROSS JOIN cnt c
           |LEFT JOIN contrib bc ON bc.v = n.id""".stripMargin)
    )
  )
}
