package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Round-97 batch: rendezvous (highest-random-weight) shard assignment
  * — the stateless shard-routing function whose RESHARDING movement is
  * provably minimal (only keys whose argmax shifts to the new shard
  * move, ≈ 1/(N+1) of them, vs `hash mod N` moving nearly everything)
  * — and canonical selection for near-dup clusters (keep the best
  * representative by source priority, not just the minimum id).
  */
object Round97Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── HRW/rendezvous sharding: shard(key) = argmax over shards of
    //    hash(key, shard). The audit assigns every doc under N=8 and
    //    N=9 and measures movement: exactly the keys whose N=9 argmax
    //    IS the new shard move — the stability property that lets a
    //    100 TB keyed store grow by one node without a full reshuffle.
    //    All-integer, one projection + one aggregate; the shard axis
    //    unrolls as a literal array (no join).
    QueryDef("q_rendezvous_shards",
      (s, d) => {
        def shardOf(n: Int): org.apache.spark.sql.Column = {
          val scores = (0 until n).map(j =>
            struct(Dedup.hash48(col("doc_id").cast("string"),
              lit(s"shard$j")).as("h"), lit(j.toLong).as("j")))
          greatest(scores: _*).getField("j")
        }
        Tables.documents(s, d).select(col("doc_id"))
          .withColumn("s8", shardOf(8))
          .withColumn("s9", shardOf(9))
          .withColumn("moved", (col("s8") =!= col("s9")).cast("long"))
          .agg(count(lit(1)).as("n_keys"),
            sum(col("moved")).as("n_moved"),
            sum(when(col("moved") === 1L && col("s9") === 8L, 1L)
              .otherwise(0L)).as("moved_to_new"))
          .selectExpr("n_keys", "n_moved", "moved_to_new",
            "n_moved * 1000000 div n_keys AS moved_rate_e6",
            // HRW invariant: EVERY move lands on the new shard — a
            // violated row here means the hash isn't per-(key, shard).
            "CAST(n_moved = moved_to_new AS BOOLEAN) AS minimal_movement")
      },
      Some {
        def h(j: Int) =
          PortableSql.hash48("CAST(doc_id AS VARCHAR)", s"'shard$j'")
        def shardOf(n: Int) = {
          // argmax via greatest over (h, j) pairs encoded as h*16+j —
          // h < 2^48, shard < 16, so the pack is collision-free and
          // preserves (h, j) lexicographic order.
          val packed = (0 until n).map(j => s"(${h(j)} * 16 + $j)")
          s"greatest(${packed.mkString(", ")}) % 16"
        }
        s"""WITH a AS (SELECT doc_id,
           |                  ${shardOf(8)} AS s8,
           |                  ${shardOf(9)} AS s9
           |           FROM documents)
           |SELECT CAST(count(*) AS BIGINT) AS n_keys,
           |       CAST(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END)
           |         AS BIGINT) AS n_moved,
           |       CAST(sum(CASE WHEN s8 <> s9 AND s9 = 8 THEN 1 ELSE 0 END)
           |         AS BIGINT) AS moved_to_new,
           |       CAST(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END)
           |         AS BIGINT) * 1000000 // count(*) AS moved_rate_e6,
           |       sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END)
           |         = sum(CASE WHEN s8 <> s9 AND s9 = 8 THEN 1 ELSE 0 END)
           |         AS minimal_movement
           |FROM a""".stripMargin
      }),

    // ── Canonical selection: near-dup clusters (the q_dedup_clusters
    //    pipeline) keep their BEST doc — argmax of (source priority,
    //    n_chars, −doc_id) via one struct max — instead of the minimum
    //    id. This is what production dedup actually ships: prefer the
    //    curated source, then the longest copy. One keyed aggregate
    //    over the cluster id; no sort, no window.
    QueryDef("q_dedup_canonical",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val cand = Dedup.candidates(Dedup.minhash(Dedup.shingles(docs)))
        val edges = cand.filter(col("n_eq") >= 6)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        val cc = Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")), edges)
        val prio = docs.select(col("doc_id").as("id"),
          when(col("source") === "wiki", 3L)
            .when(col("source") === "news", 2L).otherwise(1L).as("prio"),
          col("n_chars"))
        cc.join(prio, "id")
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("n_docs"),
            max(struct(col("prio"), col("n_chars"), (-col("id")).as("negid")))
              .as("best"))
          .where(col("n_docs") > 1)
          .select(col("cluster_id"), col("n_docs"),
            (-col("best.negid")).as("keep_doc_id"),
            col("best.prio").as("keep_prio"),
            col("best.n_chars").as("keep_n_chars"))
      },
      Some(s"""WITH RECURSIVE cand AS (SELECT * FROM ${
                DedupQueries.candSql("(SELECT doc_id, text FROM documents)")
              } c0),
              |e2 AS (SELECT doc_a AS a, doc_b AS b FROM cand WHERE n_eq >= 6
              |       UNION ALL
              |       SELECT doc_b, doc_a FROM cand WHERE n_eq >= 6),
              |ids AS (SELECT doc_id FROM documents),
              |reach(id, label) AS (
              |  SELECT doc_id, doc_id FROM ids
              |  UNION
              |  SELECT e2.b, r.label FROM reach r JOIN e2 ON e2.a = r.id),
              |cc AS (SELECT id, min(label) AS cluster_id FROM reach
              |       GROUP BY id),
              |pr AS (SELECT doc_id AS id,
              |              CASE WHEN source = 'wiki' THEN 3
              |                   WHEN source = 'news' THEN 2
              |                   ELSE 1 END AS prio,
              |              n_chars
              |       FROM documents),
              |j AS (SELECT cluster_id, id, prio, n_chars,
              |             count(*) OVER (PARTITION BY cluster_id) AS n_docs,
              |             row_number() OVER (PARTITION BY cluster_id
              |               ORDER BY prio DESC, n_chars DESC, id ASC) AS rk
              |      FROM cc JOIN pr USING (id))
              |SELECT cluster_id, CAST(n_docs AS BIGINT) AS n_docs,
              |       id AS keep_doc_id,
              |       CAST(prio AS BIGINT) AS keep_prio,
              |       CAST(n_chars AS BIGINT) AS keep_n_chars
              |FROM j WHERE rk = 1 AND n_docs > 1""".stripMargin))
  )
}
