package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.Dedup

/** Deduplication over the `documents` table (SURVEY.md §7.4 / the
  * training-data-pipeline extensions). The shared corpus has no duplicates,
  * so queries that need them inject deterministic copies (exact dups for
  * exact dedup, one-word-tail edits for near-dup) — the same injection on
  * both the Spark and oracle sides keeps the gate honest.
  */
object DedupQueries {
  import PortableSql.{hash48 => hash48Sql}

  /** documents ∪ exact copies of every 10th doc (re-keyed +1e6). */
  private def exactAug(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    docs.unionByName(docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }
  private val exactAugSql =
    """(SELECT doc_id, text FROM documents
      | UNION ALL
      | SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  /** documents ∪ near-dup copies of every 7th doc (tail words appended). */
  private def nearAug(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    docs.unionByName(docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" graft extra tail")).as("text")))
  }
  private val nearAugSql =
    """(SELECT doc_id, text FROM documents
      | UNION ALL
      | SELECT doc_id + 1000000 AS doc_id, concat(text, ' graft extra tail') AS text
      | FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  /** Oracle twin of Dedup.candidates∘minhash∘shingles over `docsSql` —
    * shared by the candidate-pair and cluster queries. */
  private[queries] def candSql(docsSql: String): String = {
    val mh = PortableSql.hexSliceToLong("hx", "j * 8")
    s"""(WITH docs AS $docsSql,
       |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM docs),
       |sh AS (SELECT doc_id,
       |              unnest(list_transform(range(1, len(ws) - 1),
       |                     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
       |       FROM w WHERE len(ws) >= 3),
       |sh2 AS (SELECT doc_id, concat(md5(shingle), md5(concat('x', shingle))) AS hx FROM sh),
       |sig AS (SELECT doc_id, j, min($mh) AS mh
       |        FROM sh2 CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) hj(j)
       |        GROUP BY doc_id, j),
       |bands AS (SELECT doc_id, j // 2 AS band,
       |                 concat(CAST(min(CASE WHEN j % 2 = 0 THEN mh END) AS VARCHAR), ':',
       |                        CAST(min(CASE WHEN j % 2 = 1 THEN mh END) AS VARCHAR)) AS bv
       |          FROM sig GROUP BY doc_id, j // 2),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
       |          FROM bands a JOIN bands b
       |            ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT p.doc_a, p.doc_b, p.n_bands,
       |       CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_eq,
       |       round(CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS DOUBLE) / 8, 6) AS est_jaccard
       |FROM pairs p
       |JOIN sig x ON x.doc_id = p.doc_a
       |JOIN sig y ON y.doc_id = p.doc_b AND y.j = x.j
       |GROUP BY 1, 2, 3)""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(

    // ── Exact dedup: hash-groupBy on content, keep smallest id.
    QueryDef("q_dedup_exact",
      (s, d) => Dedup.exact(exactAug(s, d)),
      Some(s"""SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id,
              |       count(*) AS dup_cnt
              |FROM $exactAugSql docs GROUP BY md5(text)""".stripMargin)),

    // ── MinHash + LSH candidate pairs with band counts and estimated
    //    Jaccard (n_eq of 8 minhashes).
    QueryDef("q_dedup_minhash",
      (s, d) => Dedup.candidates(Dedup.minhash(Dedup.shingles(nearAug(s, d)))),
      Some(s"SELECT * FROM ${candSql(nearAugSql)} cand")),

    // ── Pairs → clusters: connected components over strong candidate pairs
    //    (n_eq ≥ 6 of 8), per-doc cluster assignment + cluster size. Oracle:
    //    min-label transitive closure as a recursive CTE.
    QueryDef("q_dedup_clusters",
      (s, d) => {
        val docs = nearAug(s, d)
        val cand = Dedup.candidates(Dedup.minhash(Dedup.shingles(docs)))
        val edges = cand.filter(col("n_eq") >= 6)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        val cc = Dedup.connectedComponents(docs.select(col("doc_id").as("id")), edges)
          .withColumnRenamed("id", "doc_id")
        val sz = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_sz"))
        cc.join(sz, "cluster_id").select("doc_id", "cluster_id", "cluster_sz")
      },
      Some(s"""WITH RECURSIVE cand AS (SELECT * FROM ${candSql(nearAugSql)} c0),
              |e2 AS (SELECT doc_a AS a, doc_b AS b FROM cand WHERE n_eq >= 6
              |       UNION ALL
              |       SELECT doc_b AS a, doc_a AS b FROM cand WHERE n_eq >= 6),
              |nodes AS (SELECT doc_id FROM $nearAugSql docs),
              |reach(id, label) AS (
              |  SELECT doc_id, doc_id FROM nodes
              |  UNION
              |  SELECT e2.b, r.label FROM reach r JOIN e2 ON e2.a = r.id
              |),
              |cc AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id),
              |sz AS (SELECT cluster_id, count(*) AS cluster_sz FROM cc GROUP BY 1)
              |SELECT cc.doc_id, cc.cluster_id, sz.cluster_sz
              |FROM cc JOIN sz USING (cluster_id)""".stripMargin)),

    // ── SimHash 16-bit fingerprints over word unigrams.
    QueryDef("q_dedup_simhash",
      (s, d) => Dedup.simhash(Tables.documents(s, d)),
      Some {
        val h = hash48Sql("wd", "'sim'")
        val sums = (0 until 16).map(j =>
          s"CAST(sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s$j")
          .mkString(",\n              ")
        val fp = (0 until 16).map(j =>
          s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
        s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents),
           |h AS (SELECT doc_id, $h AS h FROM w WHERE wd <> ''),
           |s AS (SELECT doc_id,
           |              $sums
           |      FROM h GROUP BY doc_id)
           |SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM s""".stripMargin
      }),

    // ── The dedup endgame: keep-list = cluster canonicals (min doc id per
    //    component) — what actually ships to training after docs → pairs →
    //    clusters. Observed as counts so the result is stable-size.
    QueryDef("q_dedup_keep",
      (s, d) => {
        val docs = nearAug(s, d)
        val cand = Dedup.candidates(Dedup.minhash(Dedup.shingles(docs)))
        val edges = cand.filter(col("n_eq") >= 6)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        val cc = Dedup.connectedComponents(docs.select(col("doc_id").as("id")), edges)
        val kept = cc.filter(col("id") === col("cluster_id"))
        kept.agg(count(lit(1)).as("kept"))
          .crossJoin(docs.agg(count(lit(1)).as("total")))
          .select(col("total"), col("kept"), (col("total") - col("kept")).as("dropped"))
      },
      Some(s"""WITH RECURSIVE cand AS (SELECT * FROM ${candSql(nearAugSql)} c0),
              |e2 AS (SELECT doc_a AS a, doc_b AS b FROM cand WHERE n_eq >= 6
              |       UNION ALL
              |       SELECT doc_b AS a, doc_a AS b FROM cand WHERE n_eq >= 6),
              |nodes AS (SELECT doc_id FROM $nearAugSql docs),
              |reach(id, label) AS (
              |  SELECT doc_id, doc_id FROM nodes
              |  UNION
              |  SELECT e2.b, r.label FROM reach r JOIN e2 ON e2.a = r.id
              |),
              |cc AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id)
              |SELECT (SELECT count(*) FROM nodes) AS total,
              |       count(*) AS kept,
              |       (SELECT count(*) FROM nodes) - count(*) AS dropped
              |FROM cc WHERE id = cluster_id""".stripMargin)),

    // ── SimHash banded pairing, scored on the PLANTED near-dups (the
    //    synthetic corpus' tiny vocab makes unrelated docs fingerprint-
    //    close, so generic pairing is noise here; recovering each injected
    //    copy and its Hamming distance is the meaningful check).
    QueryDef("q_dedup_simhash_pairs",
      (s, d) => Dedup.simhashPairs(Dedup.simhash(nearAug(s, d)))
        .filter(col("doc_b") === col("doc_a") + 1000000L),
      Some {
        val h = hash48Sql("wd", "'sim'")
        val sums = (0 until 16).map(j =>
          s"CAST(sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s$j")
          .mkString(",\n              ")
        val fp = (0 until 16).map(j =>
          s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
        s"""WITH docs AS $nearAugSql,
           |w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM docs),
           |h AS (SELECT doc_id, $h AS h FROM w WHERE wd <> ''),
           |s AS (SELECT doc_id,
           |              $sums
           |      FROM h GROUP BY doc_id),
           |fps AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM s),
           |b AS (SELECT doc_id, simhash, band, (simhash >> (band * 4)) & 15 AS bv
           |      FROM fps CROSS JOIN (VALUES (0),(1),(2),(3)) bd(band)),
           |p AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
           |             a.simhash AS fp_a, b2.simhash AS fp_b
           |      FROM b a JOIN b b2
           |        ON a.band = b2.band AND a.bv = b2.bv AND a.doc_id < b2.doc_id)
           |SELECT doc_a, doc_b, fp_a, fp_b,
           |       CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
           |FROM p
           |WHERE bit_count(xor(fp_a, fp_b)) <= 3 AND doc_b = doc_a + 1000000""".stripMargin
      }),

    // ── Exact n-gram (word-set) Jaccard on a bounded candidate set.
    QueryDef("q_ngram_jaccard",
      (s, d) => Dedup.jaccardPairs(
        Tables.documents(s, d).filter(col("doc_id") < 50).select(col("doc_id"), col("text"))),
      Some("""WITH w AS (SELECT DISTINCT doc_id, wd AS word
             |           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
             |                 FROM documents WHERE doc_id < 50) u
             |           WHERE wd <> ''),
             |sizes AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
             |          FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2)
             |SELECT i.doc_a, i.doc_b, i.inter,
             |       sa.sz + sb.sz - i.inter AS uni,
             |       round(CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), 6) AS jacc
             |FROM inter i
             |JOIN sizes sa ON sa.doc_id = i.doc_a
             |JOIN sizes sb ON sb.doc_id = i.doc_b""".stripMargin))
  )
}
