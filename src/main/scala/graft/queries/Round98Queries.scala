package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Dedup, StarComponents}
import org.apache.spark.sql.functions._

/** Round-98 batch: the two remaining §7.4m layout/maintenance ops —
  * capacity-WEIGHTED rendezvous sharding (heterogeneous executors) and
  * incremental CC under edge DELETES (the split-detecting direction,
  * rebuilt only inside the blast radius).
  */
object Round98Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Weighted rendezvous: score_j = w_j / (−log₂ u_j) with
    //    u_j = hash(key, shard_j)/2^48 — the classic weighted-HRW
    //    transform, all in e6/e12 integers so both engines agree
    //    bit-for-bit. Keys land on shard argmax score; long-run share
    //    is proportional to weight. The audit emits per-shard counts
    //    beside the weight-implied expectation.
    QueryDef("q_rendezvous_weighted",
      (s, d) => {
        val weights = (0 until 8).map(j => (j % 4) + 1L)
        val wsum = weights.sum
        // nl ≥ 1 (h < 2^48 ⇒ log2E6 ≤ 48e6); score ≤ 4e12, ×16 fits.
        // r13: bind each hash to a COLUMN before feeding it to log2E6 —
        // the msb WHEN-ladder inside log2E6 references its argument ~48
        // times, so an inline md5+conv argument was re-evaluated ~100×
        // per (row, shard) (measured 3.5 s warm for 5 000 docs; ~0.5 s
        // after). The separate projection survives CollapseProject
        // because h$j is non-cheap and multiply-referenced; the ladder
        // then reads a cheap attribute. Same math, same results.
        val withH = (0 until 8).foldLeft(
          Tables.documents(s, d).select(col("doc_id"))) { (df, j) =>
          df.withColumn(s"h$j",
            greatest(Dedup.hash48(col("doc_id").cast("string"),
              lit(s"wshard$j")), lit(1L)))
        }
        val withNl = (0 until 8).foldLeft(withH) { (df, j) =>
          df.withColumn(s"nl$j",
            lit(48000000L) - Bm25.log2E6(col(s"h$j")) + lit(1L))
        }
        val packed = (0 until 8).map(j =>
          s"((${weights(j)}L * 1000000000000L div nl$j) * 16L + ${j}L)")
        withNl
          .withColumn("shard", expr(
            s"greatest(${packed.mkString(", ")}) % 16"))
          .groupBy(col("shard")).agg(count(lit(1)).as("n_keys"))
          .withColumn("weight",
            expr("CAST(shard % 4 + 1 AS BIGINT)"))
          .crossJoin(broadcast(
            Tables.documents(s, d).agg(count(lit(1)).as("n_total"))))
          .selectExpr("shard", "weight", "n_keys",
            "n_keys * 1000000 div n_total AS share_e6",
            s"weight * 1000000 div ${wsum}L AS expected_e6")
      },
      Some {
        val weights = (0 until 8).map(j => (j % 4) + 1L)
        val wsum = weights.sum
        val packed = (0 until 8).map { j =>
          val h = s"greatest(${PortableSql.hash48(
            "CAST(doc_id AS VARCHAR)", s"'wshard$j'")}, 1)"
          s"((${weights(j)} * 1000000000000 // " +
            s"(48000000 - ${Bm25.log2E6Sql(h)} + 1)) * 16 + $j)"
        }
        s"""WITH a AS (SELECT doc_id,
           |                  greatest(${packed.mkString(",\n        ")}) % 16
           |                    AS shard
           |           FROM documents),
           |t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents)
           |SELECT CAST(shard AS BIGINT) AS shard,
           |       CAST(shard % 4 + 1 AS BIGINT) AS weight,
           |       CAST(count(*) AS BIGINT) AS n_keys,
           |       CAST(count(*) AS BIGINT) * 1000000 // n_total AS share_e6,
           |       CAST(shard % 4 + 1 AS BIGINT) * 1000000 // $wsum
           |         AS expected_e6
           |FROM a CROSS JOIN t GROUP BY shard, n_total""".stripMargin
      }),

    // ── Incremental CC DELETE: standing labels for the chain+bridge
    //    graph arrive PRECOMPUTED (production holds yesterday's labels
    //    at rest; deriving them in-query made the bench pay full CC +
    //    rebuild — r9 VERDICT task 2). Bridges pair consecutive blocks
    //    of 50 (edge 100k→100k+50), so the exact standing labeling is
    //    analytic: cluster_id = id − id%100 (the pair min; holds for a
    //    trailing unpaired block too, since id%100 < 50 there —
    //    IncrementalCcFixtureSpec pins fixture == full StarComponents
    //    CC). Then remove half the bridges and rebuild ONLY the
    //    clusters that owned a removed edge (their surviving internal
    //    edges re-cluster; the untouched half keep labels without an
    //    edge read). Oracle: full CC over (edges − removed) — the
    //    increment must be exact, including the component SPLITS the
    //    removals cause.
    QueryDef("q_incremental_cc_delete",
      (s, d) => {
        val ids = Tables.documents(s, d).select(col("doc_id").as("id"))
        val chain = ids.as("x")
          .join(ids.as("y"), col("y.id") === col("x.id") + 1)
          .filter(col("x.id") % 50 =!= 49)
          .select(col("x.id").as("a"), col("y.id").as("b"))
        val bridges = ids.as("x")
          .join(ids.as("y"), col("y.id") === col("x.id") + 50)
          .filter(col("x.id") % 100 === 0)
          .select(col("x.id").as("a"), col("y.id").as("b"))
        val edges = chain.unionByName(bridges)
        val labels = ids.select(col("id"),
          (col("id") - col("id") % 100).as("cluster_id"))
        val removed = bridges.filter(col("a") % 200 === 0)
        StarComponents
          .incrementalDeleteConnectedComponents(labels, edges, removed)
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("n_nodes"), min(col("id")).as("min_id"),
            max(col("id")).as("max_id"))
      },
      Some("""WITH RECURSIVE ids AS (SELECT doc_id AS id FROM documents),
             |chain AS (SELECT x.id AS a, x.id + 1 AS b FROM ids x
             |          JOIN ids y ON y.id = x.id + 1 WHERE x.id % 50 <> 49),
             |bridges AS (SELECT x.id AS a, x.id + 50 AS b FROM ids x
             |            JOIN ids y ON y.id = x.id + 50
             |            WHERE x.id % 100 = 0),
             |surv AS (SELECT a, b FROM chain
             |         UNION ALL
             |         SELECT a, b FROM bridges WHERE a % 200 <> 0),
             |e2 AS (SELECT a, b FROM surv UNION ALL SELECT b, a FROM surv),
             |reach(id, label) AS (
             |  SELECT id, id FROM ids
             |  UNION
             |  SELECT e2.b, r.label FROM reach r JOIN e2 ON e2.a = r.id),
             |cc AS (SELECT id, min(label) AS cluster_id FROM reach
             |       GROUP BY id)
             |SELECT cluster_id, count(*) AS n_nodes, min(id) AS min_id,
             |       max(id) AS max_id
             |FROM cc GROUP BY 1""".stripMargin))
  )
}
