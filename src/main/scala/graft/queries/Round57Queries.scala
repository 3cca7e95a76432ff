package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{StarComponents, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-57 batch: a bitemporal as-of snapshot (valid-time × system-
  * time point query — the correction-aware audit read q_scd2_intervals'
  * single time axis cannot answer), bag-of-words cosine pairs (count-
  * weighted near-dup, completing the jaccard/minhash/simhash family),
  * and a graph robustness curve (largest surviving component under
  * targeted hub removal — the resilience readout over the event
  * digraph used by q_dyad_census).
  */
object Round57Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Bitemporal: v1 recorded at order day; +5% correction recorded
    //    30 days later for every 10th order. As-of system day 9312
    //    (1995-07-01), valid window [9131, 9312) (H1 1995): corrections
    //    are visible only where their transaction day made the cut.
    QueryDef("q_bitemporal",
      (s, d) => {
        val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
          col("o_orderstatus").as("status"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
            .as("valid_day"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        val v1 = base.select(col("k"), col("status"), col("valid_day"),
          col("valid_day").as("tx_day"), col("cents"), lit(1L).as("rev"))
        val v2 = base.where(col("k") % 10 === 0)
          .select(col("k"), col("status"), col("valid_day"),
            (col("valid_day") + 30).as("tx_day"),
            (col("cents") + expr("cents div 20")).as("cents"),
            lit(2L).as("rev"))
        v1.unionByName(v2)
          .where(col("valid_day") >= 9131L && col("valid_day") < 9312L &&
            col("tx_day") <= 9312L)
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("k")).orderBy(col("rev").desc)))
          .where(col("rn") === 1)
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("rev") === 2L, 1L).otherwise(0L)).as("n_corrected"),
            sum(col("cents")).as("total_cents"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS k, o_orderstatus AS status,
             |         epoch_us(o_orderdate) // 86400000000 AS valid_day,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders),
             |v AS (
             |  SELECT k, status, valid_day, valid_day AS tx_day, cents,
             |         1 AS rev FROM base
             |  UNION ALL
             |  SELECT k, status, valid_day, valid_day + 30 AS tx_day,
             |         cents + cents // 20 AS cents, 2 AS rev
             |  FROM base WHERE k % 10 = 0),
             |vis AS (
             |  SELECT *, row_number() OVER (PARTITION BY k
             |    ORDER BY rev DESC) AS rn
             |  FROM v
             |  WHERE valid_day >= 9131 AND valid_day < 9312
             |    AND tx_day <= 9312)
             |SELECT status, CAST(count(*) AS BIGINT) AS n_orders,
             |       CAST(sum(CASE WHEN rev = 2 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_corrected,
             |       CAST(sum(cents) AS BIGINT) AS total_cents
             |FROM vis WHERE rn = 1 GROUP BY 1""".stripMargin)),

    // ── BoW cosine near-dup pairs over the first 50 documents.
    QueryDef("q_bow_cosine",
      (s, d) => TextAnalysis.bowCosinePairs(
        Tables.documents(s, d).where(col("doc_id") < 50)
          .select(col("doc_id"), col("text"))),
      Some("""WITH counts AS (
             |  SELECT doc_id, wd AS word, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
             |        FROM documents WHERE doc_id < 50) u
             |  WHERE wd <> '' GROUP BY 1, 2),
             |norms AS (SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS nrm
             |          FROM counts GROUP BY 1),
             |dots AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         CAST(sum(a.c * b.c) AS BIGINT) AS dot
             |  FROM counts a JOIN counts b
             |    ON a.word = b.word AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |scored AS (
             |  SELECT doc_a, doc_b, dot,
             |         round(CAST(dot AS DOUBLE) /
             |           sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)),
             |           6) AS cos
             |  FROM dots JOIN norms na ON na.doc_id = doc_a
             |       JOIN norms nb ON nb.doc_id = doc_b)
             |SELECT doc_a, doc_b, dot, cos FROM scored
             |WHERE cos >= 0.5""".stripMargin)),

    // ── Robustness: remove the top-k hubs (degree desc, id asc) from
    //    the undirected event graph; track fragmentation.
    QueryDef("q_graph_robustness",
      (s, d) => {
        val und = Tables.events(s, d)
          .select(least(col("user_id") % 500, col("event_id") % 500).as("a"),
            greatest(col("user_id") % 500, col("event_id") % 500).as("b"))
          .where(col("a") =!= col("b")).distinct()
          .localCheckpoint(false) // reused by degrees + 3 removal rounds
        val deg = und.select(col("a").as("id"))
          .union(und.select(col("b").as("id")))
          .groupBy(col("id")).agg(count(lit(1)).as("dg"))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("dg").desc, col("id"))))
        val ids = deg.select(col("id"), col("rn")).localCheckpoint(false)
        // r12: ONE star-CC run over the disjoint union of the three
        // removal variants (variant i lives on ids offset by i*1000 —
        // node ids are < 500 by construction) instead of three
        // sequential iterative CC loops; rounds = max over variants,
        // not their sum, and per-variant labels/sizes are unchanged
        // (components never cross the offset blocks). Guide §2.4.
        val variants = Seq(0L, 50L, 200L)
        val shifted = variants.zipWithIndex.map { case (kk, i) =>
          val off = i * 1000L
          val keep = ids.where(col("rn") > kk)
            .select((col("id") + off).as("id"))
          val edges = und
            .join(ids.where(col("rn") > kk).select(col("id").as("a")), "a")
            .join(ids.where(col("rn") > kk).select(col("id").as("b")), "b")
            .select((col("a") + off).as("a"), (col("b") + off).as("b"))
          (keep, edges)
        }
        val allKeep = shifted.map(_._1).reduce(_ unionByName _)
        val allEdges = shifted.map(_._2).reduce(_ unionByName _)
        // r13 (ADVICE): a removal variant that leaves ZERO nodes must
        // still emit its row — the oracle's per-variant aggregate is
        // unconditional (n_components = 0, null n_nodes/largest_cc),
        // while a groupBy over an empty group emits nothing. Left-join
        // the aggregate onto the literal variant frame so each
        // k_removed always yields exactly one row. Identical on any
        // input where every variant keeps ≥ 1 node (all current SFs).
        import s.implicits._
        val variantFrame = variants.zipWithIndex
          .map { case (kk, i) => (i.toLong, kk) }
          .toDF("variant", "k_removed")
        val agg = StarComponents.connectedComponents(allKeep, allEdges)
          .withColumn("variant", expr("id div 1000"))
          .groupBy(col("variant"), col("cluster_id"))
          .agg(count(lit(1)).as("sz"))
          .groupBy(col("variant"))
          .agg(count(lit(1)).as("n_components"),
            sum(col("sz")).as("n_nodes"), max(col("sz")).as("largest_cc"))
        variantFrame.join(broadcast(agg), Seq("variant"), "left")
          .select(col("k_removed"), col("n_nodes"),
            coalesce(col("n_components"), lit(0L)).as("n_components"),
            col("largest_cc"))
      },
      Some {
        def piece(kk: Int) =
          s"""reach$kk(id, label) AS (
             |  SELECT id, id FROM keep$kk
             |  UNION
             |  SELECT s.b, r.label FROM reach$kk r JOIN sym$kk s ON s.a = r.id),
             |cc$kk AS (SELECT id, min(label) AS cl FROM reach$kk GROUP BY 1),
             |sz$kk AS (SELECT cl, CAST(count(*) AS BIGINT) AS sz
             |          FROM cc$kk GROUP BY 1),
             |row$kk AS (SELECT CAST($kk AS BIGINT) AS k_removed,
             |                  CAST(sum(sz) AS BIGINT) AS n_nodes,
             |                  CAST(count(*) AS BIGINT) AS n_components,
             |                  CAST(max(sz) AS BIGINT) AS largest_cc
             |           FROM sz$kk)""".stripMargin
        def prelude(kk: Int) =
          s"""keep$kk AS (SELECT id FROM deg WHERE rn > $kk),
             |e$kk AS (SELECT a, b FROM und
             |         WHERE a IN (SELECT id FROM keep$kk)
             |           AND b IN (SELECT id FROM keep$kk)),
             |sym$kk AS (SELECT a, b FROM e$kk
             |           UNION ALL SELECT b AS a, a AS b FROM e$kk)""".stripMargin
        s"""WITH RECURSIVE und AS (
           |  SELECT DISTINCT least(user_id % 500, event_id % 500) AS a,
           |         greatest(user_id % 500, event_id % 500) AS b
           |  FROM events WHERE user_id % 500 <> event_id % 500),
           |deg AS (
           |  SELECT id, row_number() OVER (ORDER BY dg DESC, id) AS rn
           |  FROM (SELECT id, count(*) AS dg
           |        FROM (SELECT a AS id FROM und
           |              UNION ALL SELECT b FROM und)
           |        GROUP BY 1)),
           |${prelude(0)}, ${piece(0)},
           |${prelude(50)}, ${piece(50)},
           |${prelude(200)}, ${piece(200)}
           |SELECT * FROM row0
           |UNION ALL SELECT * FROM row50
           |UNION ALL SELECT * FROM row200""".stripMargin
      })
  )
}
