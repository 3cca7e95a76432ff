package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Pareto, Ranking, Stats}
import org.apache.spark.sql.functions._

/** Round-49 batch: Herfindahl–Hirschman supplier-concentration index
  * (the one-number whole-distribution companion of q_abc_pareto /
  * q_gini), precision-recall AUC (the heavy-negative-corpus companion
  * of q_auc_rank over the same documents scoring), and Cohen's kappa
  * (chance-corrected rater agreement — the pairwise companion of the
  * q_chi_square / q_theils_u association family).
  */
object Round49Queries {

  private def cents(c: String) = s"CAST(floor($c * 100 + 0.5) AS BIGINT)"

  def defs: Seq[QueryDef] = Seq(

    // ── HHI of discounted-revenue concentration across suppliers
    //    within each nation: one supplier-keyed aggregate (supplier →
    //    nation dims broadcast), then the group rollup.
    QueryDef("q_hhi",
      (s, d) => Pareto.hhi(
        Tables.lineitem(s, d)
          .join(broadcast(Tables.supplier(s, d)
            .join(broadcast(Tables.nation(s, d)
              .select(col("n_nationkey"), col("n_name"))),
              col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey"), col("n_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .withColumn("rev_cp",
            floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
              (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))),
        "n_name", "s_suppkey", "rev_cp"),
      Some(s"""WITH rev AS (SELECT n_name AS g, s_suppkey AS m,
              |               CAST(sum(${cents("l_extendedprice")}
              |                 * (100 - ${cents("l_discount")})) AS BIGINT) AS rev
              |             FROM lineitem
              |             JOIN supplier ON l_suppkey = s_suppkey
              |             JOIN nation ON s_nationkey = n_nationkey
              |             GROUP BY 1, 2),
              |tot AS (SELECT g, CAST(sum(rev) AS BIGINT) AS tot,
              |               CAST(count(*) AS BIGINT) AS n_members
              |        FROM rev GROUP BY 1)
              |SELECT g, n_members, tot AS total_cents,
              |       CAST(sum((rev * 10000 // tot) * (rev * 10000 // tot))
              |            AS BIGINT) AS hhi_e8
              |FROM rev JOIN tot USING (g) GROUP BY 1, 2, 3""".stripMargin)),

    // ── PR-AUC of n_chars as an English-document detector — the same
    //    scoring as q_auc_rank so ROC vs PR read side by side.
    QueryDef("q_pr_auc",
      (s, d) => Ranking.prAuc(
        Tables.documents(s, d).select(col("n_chars"),
          (col("lang") === "en").as("is_en")),
        "n_chars", "is_en"),
      Some("""WITH byval AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cnt,
             |                      CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             |                           AS BIGINT) AS pc
             |               FROM documents GROUP BY 1),
             |r AS (SELECT v, cnt, pc,
             |             CAST(sum(cnt) OVER w AS BIGINT) AS cum_cnt,
             |             CAST(sum(pc) OVER w AS BIGINT) AS cum_pos
             |      FROM byval WINDOW w AS (ORDER BY v DESC ROWS UNBOUNDED PRECEDING))
             |SELECT CAST(sum(pc) AS BIGINT) AS n_pos,
             |       CAST(sum(cnt - pc) AS BIGINT) AS n_neg,
             |       CAST(CASE WHEN sum(pc) = 0 THEN NULL
             |            ELSE sum(pc * (cum_pos * 1000000 // cum_cnt)) // sum(pc)
             |            END AS BIGINT) AS ap_e6
             |FROM r""".stripMargin)),

    // ── Cohen's kappa between the value-cents quality label and the
    //    same label on a deterministically jittered copy — two "raters"
    //    whose agreement is real but imperfect.
    QueryDef("q_cohens_kappa",
      (s, d) => Stats.cohensKappa(
        Tables.events(s, d)
          .withColumn("c", floor(col("value") * 100 + 0.5).cast("long"))
          .withColumn("c2", col("c") + (col("event_id") % 4001) - 2000)
          .select(
            when(col("c") < 10000L, "low").when(col("c") < 25000L, "mid")
              .otherwise("high").as("a"),
            when(col("c2") < 10000L, "low").when(col("c2") < 25000L, "mid")
              .otherwise("high").as("b")),
        "a", "b"),
      Some("""WITH e AS (SELECT CASE WHEN c < 10000 THEN 'low'
             |                      WHEN c < 25000 THEN 'mid' ELSE 'high' END AS a,
             |                 CASE WHEN c2 < 10000 THEN 'low'
             |                      WHEN c2 < 25000 THEN 'mid' ELSE 'high' END AS b
             |          FROM (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
             |                       CAST(floor(value * 100 + 0.5) AS BIGINT)
             |                         + (event_id % 4001) - 2000 AS c2
             |                FROM events)),
             |cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
             |ra AS (SELECT a, CAST(sum(c) AS BIGINT) AS na FROM cells GROUP BY 1),
             |rb AS (SELECT b, CAST(sum(c) AS BIGINT) AS nb FROM cells GROUP BY 1),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
             |ag AS (SELECT CAST(coalesce(sum(CASE WHEN a = b THEN c END), 0)
             |                   AS BIGINT) AS agree FROM cells),
             |pe AS (SELECT CAST(coalesce(sum(((na * nb) // n * 1000000) // n), 0)
             |                   AS BIGINT) AS pe_e6
             |       FROM ra JOIN rb ON a = b CROSS JOIN tot)
             |SELECT n, CAST(agree * 1000000 // n AS BIGINT) AS po_e6, pe_e6,
             |       CAST(CASE WHEN agree * 1000000 // n >= pe_e6
             |         THEN (agree * 1000000 // n - pe_e6) * 1000000
             |              // greatest(1000000 - pe_e6, 1)
             |         ELSE -((pe_e6 - agree * 1000000 // n) * 1000000
             |                // greatest(1000000 - pe_e6, 1))
             |       END AS BIGINT) AS kappa_e6
             |FROM ag CROSS JOIN tot CROSS JOIN pe""".stripMargin))
  )
}
