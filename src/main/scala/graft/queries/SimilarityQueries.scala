package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.Similarity

/** Similarity-search queries over `embeddings` (SURVEY.md §7.4): exact
  * brute-force cosine top-k, random-hyperplane LSH candidate pairs
  * (integer-valued hyperplanes so bucket assignment is exact in any
  * engine), and per-label centroid statistics.
  */
object SimilarityQueries {

  /** 8 integer hyperplanes in [-1000,1000]^64, seeded — embedded as
    * literals in both the Spark plan and the oracle SQL. */
  private val planesInt: Seq[Seq[Int]] = Similarity.hyperplanesInt(8, 64)
  private val planes: Seq[Seq[Double]] = planesInt.map(_.map(_.toDouble))

  private val planesSqlValues: String =
    planesInt.zipWithIndex.map { case (p, j) =>
      s"($j, CAST(${p.mkString("[", ", ", "]")} AS DOUBLE[]))"
    }.mkString(",\n            ")

  /** Embeddings with near-dup injection: every 20th vector re-keyed +1e6
    * and scaled ×1.001 (cos ≈ 1 → same LSH bucket, found as candidate). */
  private def augmented(s: org.apache.spark.sql.SparkSession, d: String) = {
    val e = Similarity.cast(Tables.embeddings(s, d)).select(col("vec_id"), col("ev"))
    e.unionByName(e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("ev"), x => x * lit(1001.0) / lit(1000.0)).as("ev")))
  }
  private val augmentedSql =
    """(SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
      | UNION ALL
      | SELECT vec_id + 1000000 AS vec_id,
      |        list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1001 / 1000) AS ev
      | FROM embeddings WHERE vec_id % 20 = 0)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── The vector primitive in isolation: squared norms.
    QueryDef("q_embedding_norms",
      (s, d) => Similarity.cast(Tables.embeddings(s, d))
        .select(col("vec_id"), col("label"),
          round(Similarity.dot(col("ev"), col("ev")), 6).as("norm_sq")),
      Some("""SELECT vec_id, label,
             |       round(list_dot_product(CAST(embedding AS DOUBLE[]),
             |                              CAST(embedding AS DOUBLE[])), 6) AS norm_sq
             |FROM embeddings""".stripMargin)),

    // ── Exact brute-force cosine top-10 against the vec_id=0 query vector.
    QueryDef("q_sim_topk_brute",
      (s, d) => {
        val e = Similarity.cast(Tables.embeddings(s, d))
        val q = e.filter(col("vec_id") === 0).select(col("ev").as("qv"))
        Similarity.topK(e.filter(col("vec_id") > 0).select(col("vec_id"), col("ev")), q, 10)
      },
      Some("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings WHERE vec_id > 0)
             |SELECT vec_id,
             |       round(list_dot_product(ev, qv) /
             |             (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
             |FROM e, q
             |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin)),

    // ── LSH-bucketed ANN candidate pairs (the 100 TB path: pairs only ever
    //    form inside a bucket). Injected scaled copies land in the same
    //    bucket with cos ≈ 1.
    QueryDef("q_sim_lsh_pairs",
      (s, d) => Similarity.lshPairs(augmented(s, d), planes),
      Some(s"""WITH e AS $augmentedSql,
              |planes(j, p) AS (VALUES
              |            $planesSqlValues),
              |bk AS (SELECT vec_id,
              |              CAST(sum(CASE WHEN list_dot_product(e.ev, planes.p) > 0
              |                            THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
              |       FROM e CROSS JOIN planes GROUP BY vec_id),
              |b AS (SELECT e.vec_id, e.ev, bk.bucket FROM e JOIN bk USING (vec_id))
              |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
              |       round(list_dot_product(a.ev, b.ev) /
              |             (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))), 6) AS cos
              |FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id""".stripMargin)),

    // ── Embedding-cosine near-duplicate detection: LSH candidates filtered
    //    at cos ≥ 0.999 — recovers exactly the injected scaled copies
    //    without an all-pairs pass (the embedding leg of the dedup suite).
    QueryDef("q_dedup_embedding",
      (s, d) => Similarity.lshPairs(augmented(s, d), planes)
        .filter(col("cos") >= 0.999)
        .select(col("vec_a"), col("vec_b"), col("cos")),
      Some(s"""WITH e AS $augmentedSql,
              |planes(j, p) AS (VALUES
              |            $planesSqlValues),
              |bk AS (SELECT vec_id,
              |              CAST(sum(CASE WHEN list_dot_product(e.ev, planes.p) > 0
              |                            THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
              |       FROM e CROSS JOIN planes GROUP BY vec_id),
              |b AS (SELECT e.vec_id, e.ev, bk.bucket FROM e JOIN bk USING (vec_id))
              |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |       round(list_dot_product(a.ev, b.ev) /
              |             (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))), 6) AS cos
              |FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
              |WHERE round(list_dot_product(a.ev, b.ev) /
              |            (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))), 6) >= 0.999""".stripMargin)),

    // ── IVF-style ANN: coarse-quantize to 8 fixed centroids, probe only
    //    the query's cell (corpus-wide scan never happens — the index
    //    path for 100 TB; a production index k-means-trains centroids).
    QueryDef("q_sim_ivf",
      (s, d) => {
        val e = Similarity.cast(Tables.embeddings(s, d)).select(col("vec_id"), col("ev"))
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("ev").as("cv"))
        val q = e.filter(col("vec_id") === 0).select(col("ev").as("qv"))
        Similarity.ivfProbe(Similarity.ivfAssign(e, cents), cents, q, 5)
      },
      Some("""WITH cents AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
             |               FROM embeddings WHERE vec_id < 8),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
             |asn AS (SELECT vec_id, ev, c_id FROM (
             |          SELECT e.vec_id, e.ev, c.c_id,
             |                 row_number() OVER (PARTITION BY e.vec_id
             |                   ORDER BY list_dot_product(e.ev, c.cv) /
             |                     (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             |                   c.c_id ASC) AS rn
             |          FROM e CROSS JOIN cents c) t
             |        WHERE rn = 1),
             |q AS (SELECT ev AS qv, c_id AS q_cell FROM asn WHERE vec_id = 0)
             |SELECT a.vec_id,
             |       round(list_dot_product(a.ev, q.qv) /
             |             (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
             |FROM asn a, q WHERE a.c_id = q.q_cell
             |ORDER BY cos DESC, vec_id ASC LIMIT 5""".stripMargin)),

    // ── ANN self-evaluation: recall@5 of the IVF probe against the exact
    //    brute-force top-5 over the same corpus — the metric that decides
    //    whether an index's speed/recall trade is acceptable before it
    //    ships. Both legs reuse the library operators.
    QueryDef("q_sim_recall",
      (s, d) => {
        val e = Similarity.cast(Tables.embeddings(s, d)).select(col("vec_id"), col("ev"))
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("ev").as("cv"))
        val q = e.filter(col("vec_id") === 0).select(col("ev").as("qv"))
        val ivf = Similarity.ivfProbe(Similarity.ivfAssign(e, cents), cents, q, 5)
          .select(col("vec_id"))
        val brute = Similarity.topK(e, q, 5).select(col("vec_id"))
        ivf.join(brute, "vec_id")
          .agg(count(lit(1)).as("n_hits"))
          .select(lit(5L).as("k"), col("n_hits"),
            round(col("n_hits").cast("double") / 5.0, 2).as("recall"))
      },
      Some("""WITH cents AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
             |               FROM embeddings WHERE vec_id < 8),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
             |asn AS (SELECT vec_id, ev, c_id FROM (
             |          SELECT e.vec_id, e.ev, c.c_id,
             |                 row_number() OVER (PARTITION BY e.vec_id
             |                   ORDER BY list_dot_product(e.ev, c.cv) /
             |                     (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             |                   c.c_id ASC) AS rn
             |          FROM e CROSS JOIN cents c) t
             |        WHERE rn = 1),
             |q AS (SELECT ev AS qv, c_id AS q_cell FROM asn WHERE vec_id = 0),
             |ivf AS (SELECT a.vec_id,
             |               round(list_dot_product(a.ev, q.qv) /
             |                     (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
             |        FROM asn a, q WHERE a.c_id = q.q_cell
             |        ORDER BY cos DESC, vec_id ASC LIMIT 5),
             |brute AS (SELECT e.vec_id,
             |                 round(list_dot_product(e.ev, q.qv) /
             |                       (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
             |          FROM e, q
             |          ORDER BY cos DESC, vec_id ASC LIMIT 5)
             |SELECT CAST(5 AS BIGINT) AS k, count(*) AS n_hits,
             |       round(CAST(count(*) AS DOUBLE) / CAST('5.0' AS DOUBLE), 2) AS recall
             |FROM ivf JOIN brute USING (vec_id)""".stripMargin)),

    // ── One full k-means training round (assign → recompute → re-assign):
    //    the centroid-training step q_sim_ivf's Scaladoc points at, oracle-
    //    checked with the iteration unrolled. Output: post-round cluster
    //    sizes + recomputed-centroid norms.
    QueryDef("q_kmeans_round",
      (s, d) => {
        val e = Similarity.cast(Tables.embeddings(s, d)).select(col("vec_id"), col("ev"))
        val c0 = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("ev").as("cv"))
        val c1 = Similarity.kmeansRecompute(Similarity.ivfAssign(e, c0))
        val asn1 = Similarity.ivfAssign(e, c1)
        asn1.groupBy(col("c_id")).agg(count(lit(1)).as("n_vecs"))
          .join(c1.select(col("c_id"),
            round(Similarity.dot(col("cv"), col("cv")), 4).as("centroid_norm_sq")), "c_id")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
             |c0 AS (SELECT vec_id AS c_id, ev AS cv FROM e WHERE vec_id < 8),
             |a0 AS (SELECT vec_id, ev, c_id FROM (
             |         SELECT e.vec_id, e.ev, c.c_id,
             |                row_number() OVER (PARTITION BY e.vec_id
             |                  ORDER BY list_dot_product(e.ev, c.cv) /
             |                    (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             |                  c.c_id ASC) AS rn
             |         FROM e CROSS JOIN c0 c) t WHERE rn = 1),
             |c1e AS (SELECT c_id, i, round(avg(v), 4) AS c
             |        FROM (SELECT c_id, generate_subscripts(ev, 1) AS i, unnest(ev) AS v
             |              FROM a0) x
             |        GROUP BY 1, 2),
             |c1 AS (SELECT c_id, list(c ORDER BY i) AS cv FROM c1e GROUP BY 1),
             |a1 AS (SELECT vec_id, c_id FROM (
             |         SELECT e.vec_id, c.c_id,
             |                row_number() OVER (PARTITION BY e.vec_id
             |                  ORDER BY list_dot_product(e.ev, c.cv) /
             |                    (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             |                  c.c_id ASC) AS rn
             |         FROM e CROSS JOIN c1 c) t WHERE rn = 1),
             |sz AS (SELECT c_id, count(*) AS n_vecs FROM a1 GROUP BY 1)
             |SELECT sz.c_id, sz.n_vecs,
             |       round(list_dot_product(c1.cv, c1.cv), 4) AS centroid_norm_sq
             |FROM sz JOIN c1 ON sz.c_id = c1.c_id""".stripMargin)),

    // ── Per-label centroid statistics (element-wise mean via explode —
    //    groupBy(label, i) keeps partial aggregation; no wide-row pivot).
    QueryDef("q_label_centroids",
      (s, d) => {
        val e = Similarity.cast(Tables.embeddings(s, d))
        val el = e.select(col("label"), posexplode(col("ev")).as(Seq("i", "v")))
        val cent = el.groupBy(col("label"), col("i")).agg(avg(col("v")).as("c"))
        val norm = cent.groupBy(col("label"))
          .agg(round(sum(col("c") * col("c")), 4).as("centroid_norm_sq"))
        norm.join(e.groupBy(col("label")).agg(count(lit(1)).as("n_vecs")), Seq("label"))
      },
      Some("""WITH el AS (SELECT label, generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS i,
             |                   unnest(CAST(embedding AS DOUBLE[])) AS v
             |            FROM embeddings),
             |cent AS (SELECT label, i, avg(v) AS c FROM el GROUP BY label, i),
             |norm AS (SELECT label, round(sum(c * c), 4) AS centroid_norm_sq FROM cent GROUP BY label),
             |sizes AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label)
             |SELECT norm.label, centroid_norm_sq, n_vecs FROM norm JOIN sizes USING (label)""".stripMargin))
  )
}
