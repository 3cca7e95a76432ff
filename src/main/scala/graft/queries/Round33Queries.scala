package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Round-33 batch: CMS/AMS join-cardinality estimation — the optimizer
  * sketch, graded against the exact join size.
  */
object Round33Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── How big is events ⋈ customer on (user_id = c_custkey)? Sketch
    //    inner product vs the exact key-count product.
    QueryDef("q_join_size_estimate",
      (s, d) => Sketches.joinSizeEstimate(
        Tables.events(s, d), "user_id", Tables.customer(s, d), "c_custkey"),
      Some {
        def h(side: String, j: Int) =
          PortableSql.hash48(s"CAST($side AS VARCHAR)", s"'cms$j'")
        def cms(tbl: String, key: String) = (0 until 3).map(j =>
          s"SELECT $j AS j, ${h(key, j)} % 64 AS bucket FROM $tbl")
          .mkString("\n UNION ALL\n ")
        s"""WITH ca AS (SELECT j, bucket, count(*) AS c FROM (
           | ${cms("events", "user_id")}) u GROUP BY 1, 2),
           |cb AS (SELECT j, bucket, count(*) AS c FROM (
           | ${cms("customer", "c_custkey")}) u GROUP BY 1, 2),
           |dots AS (SELECT ca.j, sum(ca.c * cb.c) AS dot
           |         FROM ca JOIN cb ON cb.j = ca.j AND cb.bucket = ca.bucket
           |         GROUP BY ca.j),
           |est AS (SELECT CAST(min(dot) AS BIGINT) AS est_rows FROM dots),
           |na AS (SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1),
           |nb AS (SELECT c_custkey AS k, count(*) AS n FROM customer
           |       GROUP BY 1),
           |ex AS (SELECT CAST(coalesce(sum(na.n * nb.n), 0) AS BIGINT)
           |         AS exact_rows
           |       FROM na JOIN nb ON nb.k = na.k)
           |SELECT est_rows, exact_rows,
           |       CAST(CASE WHEN exact_rows = 0 THEN NULL
           |            ELSE (est_rows - exact_rows) * 1000000 // exact_rows
           |            END AS BIGINT) AS over_e6
           |FROM est CROSS JOIN ex""".stripMargin
      })
  )
}
