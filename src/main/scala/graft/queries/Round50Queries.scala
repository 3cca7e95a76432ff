package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Graph, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-50 batch: bowtie decomposition of a directed graph (the
  * web-graph structure report — double BFS from a core seed, no SCC
  * fixpoint), train/eval vocabulary KL divergence (the distribution-
  * drift audit of the LLM-curation family — q_psi_drift bins numbers,
  * this compares token distributions), and a zone-map pruning audit
  * (per-file min/max vs a predicate window: what fraction of files a
  * lakehouse scan could skip — the complement of q_zorder_layout's
  * clustering metric).
  */
object Round50Queries {

  /** Directed bowtie test graph over part keys 0..99: core = 30-cycle
    * on 30..59 (+5-strided core→out spokes), IN = chain 0..29 feeding
    * the core, OUT = chain 60..89 fed by it, OTHER = isolated chain
    * 90..99. */
  private def bowtieEdges(s: org.apache.spark.sql.SparkSession, d: String) = {
    val nodes = Tables.part(s, d)
      .select((col("p_partkey") % 100).as("id")).distinct()
    val e = nodes.filter(col("id").between(30, 59))
      .select(col("id").as("src"), (lit(30) + (col("id") - 29) % 30).as("dst"))
      .unionByName(nodes.filter(col("id").between(0, 29))
        .select(col("id").as("src"), (col("id") + 30).as("dst")))
      .unionByName(nodes.filter(col("id").between(0, 28))
        .select(col("id").as("src"), (col("id") + 1).as("dst")))
      .unionByName(nodes.filter(col("id").between(30, 59) && col("id") % 5 === 0)
        .select(col("id").as("src"), (col("id") + 30).as("dst")))
      .unionByName(nodes.filter(col("id").between(60, 88))
        .select(col("id").as("src"), (col("id") + 1).as("dst")))
      .unionByName(nodes.filter(col("id").between(90, 98))
        .select(col("id").as("src"), (col("id") + 1).as("dst")))
      .distinct()
    (nodes, e)
  }

  private val bowtieGraphSql =
    """nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
      |e AS (SELECT id AS src, 30 + (id - 29) % 30 AS dst FROM nodes
      |      WHERE id BETWEEN 30 AND 59
      |      UNION SELECT id, id + 30 FROM nodes WHERE id BETWEEN 0 AND 29
      |      UNION SELECT id, id + 1 FROM nodes WHERE id BETWEEN 0 AND 28
      |      UNION SELECT id, id + 30 FROM nodes
      |            WHERE id BETWEEN 30 AND 59 AND id % 5 = 0
      |      UNION SELECT id, id + 1 FROM nodes WHERE id BETWEEN 60 AND 88
      |      UNION SELECT id, id + 1 FROM nodes WHERE id BETWEEN 90 AND 98)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── Bowtie classes around seed 45 (in the core cycle): expected
    //    core=30, in=30, out=30, other=10 at every SF.
    QueryDef("q_bowtie",
      (s, d) => {
        val (nodes, e) = bowtieEdges(s, d)
        Graph.bowtie(nodes.withColumn("is_seed", col("id") === 45), e,
          "is_seed", 40)
      },
      Some(s"""WITH RECURSIVE $bowtieGraphSql,
              |fwd AS (SELECT 45 AS id
              |        UNION SELECT e.dst FROM fwd JOIN e ON e.src = fwd.id),
              |bwd AS (SELECT 45 AS id
              |        UNION SELECT e.src FROM bwd JOIN e ON e.dst = bwd.id)
              |SELECT cls, CAST(count(*) AS BIGINT) AS n_nodes FROM (
              |  SELECT n.id,
              |         CASE WHEN f.id IS NOT NULL AND b.id IS NOT NULL THEN 'core'
              |              WHEN b.id IS NOT NULL THEN 'in'
              |              WHEN f.id IS NOT NULL THEN 'out'
              |              ELSE 'other' END AS cls
              |  FROM nodes n LEFT JOIN fwd f ON n.id = f.id
              |       LEFT JOIN bwd b ON n.id = b.id)
              |GROUP BY 1""".stripMargin)),

    // ── KL(train‖eval) / KL(eval‖train) over the even/odd doc_id
    //    split's unigram distributions, Laplace-smoothed on the union
    //    vocabulary.
    QueryDef("q_kl_vocab",
      (s, d) => TextAnalysis.klVocab(
        Tables.documents(s, d)
          .select((col("doc_id") % 2).as("split"),
            explode(split(col("text"), " ")).as("word"))),
      Some {
        def lg(x: String, y: String) =
          Bm25.log2E6Sql(x) + " - " + Bm25.log2E6Sql(y)
        s"""WITH tok AS (SELECT doc_id % 2 AS split,
           |                   unnest(string_split(text, ' ')) AS word
           |            FROM documents),
           |counts AS (SELECT word,
           |             CAST(sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           |             CAST(sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
           |           FROM tok GROUP BY 1),
           |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
           |               CAST(sum(cb) AS BIGINT) AS nb,
           |               CAST(count(*) AS BIGINT) AS v FROM counts),
           |terms AS (SELECT v AS vocab, na AS n_a, nb AS n_b,
           |                 na + v AS da, nb + v AS db,
           |                 (ca + 1) * (${lg("((ca + 1) * (nb + v))", "((cb + 1) * (na + v))")}) AS tab,
           |                 (cb + 1) * (${lg("((cb + 1) * (na + v))", "((ca + 1) * (nb + v))")}) AS tba
           |          FROM counts CROSS JOIN tot)
           |SELECT vocab, n_a, n_b,
           |       CAST(greatest(sum(tab), 0) // max(da) AS BIGINT) AS kl_ab_e6,
           |       CAST(greatest(sum(tba), 0) // max(db) AS BIGINT) AS kl_ba_e6
           |FROM terms GROUP BY 1, 2, 3""".stripMargin
      }),

    // ── Zone-map pruning audit: files = 200 orderkey buckets per
    //    return-flag partition, predicate = ship day ∈ [9131, 9161)
    //    (Jan 1995). A file is prunable when its [min, max] day span
    //    misses the window entirely.
    QueryDef("q_zonemap_prune",
      (s, d) => {
        val files = Tables.lineitem(s, d)
          .select(col("l_returnflag").as("part"),
            (col("l_orderkey") % 200).as("file_id"),
            expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
              .as("day"))
          .groupBy(col("part"), col("file_id"))
          .agg(min(col("day")).as("min_day"), max(col("day")).as("max_day"),
            count(lit(1)).as("n_rows"))
        files
          .withColumn("prunable",
            (col("max_day") < 9131L) || (col("min_day") >= 9161L))
          .groupBy(col("part"))
          .agg(count(lit(1)).as("n_files"),
            sum(when(col("prunable"), 1L).otherwise(0L)).as("n_prunable"),
            sum(when(col("prunable"), col("n_rows")).otherwise(0L))
              .as("rows_skipped"),
            sum(col("n_rows")).as("rows_total"))
          .withColumn("prune_e6",
            expr("n_prunable * 1000000 div n_files"))
      },
      Some("""WITH f AS (SELECT l_returnflag AS part, l_orderkey % 200 AS file_id,
             |                 min(epoch_us(l_shipdate) // 86400000000) AS min_day,
             |                 max(epoch_us(l_shipdate) // 86400000000) AS max_day,
             |                 CAST(count(*) AS BIGINT) AS n_rows
             |          FROM lineitem GROUP BY 1, 2)
             |SELECT part, CAST(count(*) AS BIGINT) AS n_files,
             |       CAST(sum(CASE WHEN max_day < 9131 OR min_day >= 9161
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_prunable,
             |       CAST(sum(CASE WHEN max_day < 9131 OR min_day >= 9161
             |                     THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped,
             |       CAST(sum(n_rows) AS BIGINT) AS rows_total,
             |       CAST(sum(CASE WHEN max_day < 9131 OR min_day >= 9161
             |                     THEN 1 ELSE 0 END) * 1000000 // count(*)
             |            AS BIGINT) AS prune_e6
             |FROM f GROUP BY 1""".stripMargin))
  )
}
