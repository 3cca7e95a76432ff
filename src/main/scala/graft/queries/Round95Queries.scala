package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bucketed
import org.apache.spark.sql.functions._

/** Round-95 batch: the bucketed co-located join (§7.4l's top 100 TB
  * candidate) — pay the shuffle ONCE at layout-write time, then join
  * and aggregate on the bucket key with a ZERO-exchange plan. The
  * oracle is the plain join (bucketing must not change results);
  * [[graft.BucketedJoinSpec]] pins the zero-exchange plan property.
  */
object Round95Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Customer order rollup over bucketed orders ⋈ bucketed customer
    //    (both bucketBy(8, custkey) + sortBy): scan → SMJ (no exchange,
    //    no sort) → keyed agg (no exchange) → one top-level plan with
    //    zero ShuffleExchange nodes. The layout write inside the query
    //    is the amortized one-time cost; rerunning overwrites.
    QueryDef("q_bucketed_join",
      (s, d) => {
        Bucketed.writeBucketed(
          Tables.orders(s, d).select(col("o_custkey"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
              .as("cents")),
          "graft_bkt_orders", "o_custkey", 8)
        Bucketed.writeBucketed(
          Tables.customer(s, d).select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment")),
          "graft_bkt_customer", "o_custkey", 8)
        Bucketed.join(s, "graft_bkt_orders", "graft_bkt_customer",
            "o_custkey")
          .groupBy(col("o_custkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev_c"))
      },
      Some("""SELECT o_custkey, c_mktsegment,
             |       CAST(count(*) AS BIGINT) AS n_orders,
             |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |         AS BIGINT) AS rev_c
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1, 2""".stripMargin)),

    // ── Left-outer interval join batch twin (StreamJoins
    //    .joinLeftOuterWithin): clicks left-joined to same-user
    //    purchases within ±1 h; unmatched clicks survive null-padded.
    //    Per user: distinct clicks, matched pairs, clicks with NO
    //    purchase in range. One keyed shuffle; range predicate applies
    //    inside the joined key group.
    QueryDef("q_interval_left_outer",
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("t", unix_micros(col("ts")))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("u"), col("t").as("tc"),
            col("event_id").as("cid"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("u2"), col("t").as("tp"))
        clicks.join(buys,
            col("u") === col("u2") &&
              col("tp") >= col("tc") - 3600000000L &&
              col("tp") <= col("tc") + 3600000000L, "left_outer")
          .groupBy(col("u"))
          .agg(countDistinct(col("cid")).as("n_clicks"),
            count(col("tp")).as("n_pairs"),
            countDistinct(when(col("tp").isNull, col("cid")))
              .as("n_unmatched"))
      },
      Some("""WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t,
             |                 event_type AS et, event_id FROM events),
             |c AS (SELECT u, t AS tc, event_id AS cid FROM e
             |      WHERE et = 'click'),
             |b AS (SELECT u, t AS tp FROM e WHERE et = 'purchase')
             |SELECT c.u, CAST(count(DISTINCT c.cid) AS BIGINT) AS n_clicks,
             |       CAST(count(b.tp) AS BIGINT) AS n_pairs,
             |       CAST(count(DISTINCT CASE WHEN b.tp IS NULL THEN c.cid
             |         END) AS BIGINT) AS n_unmatched
             |FROM c LEFT JOIN b ON c.u = b.u
             |  AND b.tp >= c.tc - 3600000000 AND b.tp <= c.tc + 3600000000
             |GROUP BY 1""".stripMargin)),

    // ── Theta-sketch-style SET OPERATIONS over KMV sketches: union and
    //    intersection cardinality of two token vocabularies (en vs
    //    non-en) from their k=128 minimum portable hashes — θ = k-th
    //    smallest of the merged sketch, |A∪B| ≈ (k−1)·2^48/θ,
    //    |A∩B| ≈ |{h < θ in BOTH sketches}|·2^48/θ — the cross-dataset
    //    overlap estimator a corpus-curation pipeline needs, graded
    //    against the exact counts in the same row. Sketch build is
    //    distinct + top-k per side (never all-pairs); the estimate
    //    arithmetic is all-integer, so both engines agree exactly.
    QueryDef("q_kmv_set_ops",
      (s, d) => {
        val k = 128
        val toks = Tables.documents(s, d)
          .select(col("lang"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .select((col("lang") === "en").as("isA"), col("w"))
          .distinct()
          .withColumn("h", greatest(
            graft.ops.Dedup.hash48(col("w"), lit("kmvset")), lit(1L)))
          .localCheckpoint(false) // sketches + exact audit share one scan
        val ka = toks.filter(col("isA")).select(col("h")).distinct()
          .orderBy(col("h")).limit(k).localCheckpoint(false)
        val kb = toks.filter(!col("isA")).select(col("h")).distinct()
          .orderBy(col("h")).limit(k).localCheckpoint(false)
        val un = ka.unionByName(kb).distinct().orderBy(col("h")).limit(k)
          .localCheckpoint(false)
        val stats = un.agg(count(lit(1)).as("ku"), max(col("h")).as("theta"))
        val common = ka.join(kb, "h").crossJoin(broadcast(stats))
          .where(col("h") < col("theta"))
          .agg(count(lit(1)).as("common"))
        val exact = toks.agg(
          countDistinct(col("w")).as("exact_union"),
          countDistinct(when(col("isA"), col("w"))).as("na"),
          countDistinct(when(!col("isA"), col("w"))).as("nb"))
        stats.crossJoin(broadcast(common)).crossJoin(broadcast(exact))
          .selectExpr("ku", "theta", "common",
            s"""CASE WHEN ku < $k THEN ku
               |ELSE ($k - 1) * 281474976710656L div theta
               |END AS union_est""".stripMargin,
            "common * 281474976710656L div theta AS inter_est",
            "exact_union", "na + nb - exact_union AS exact_inter")
      },
      Some {
        val k = 128
        val h = PortableSql.hash48("w", "'kmvset'")
        s"""WITH toks AS (
           |  SELECT DISTINCT lang = 'en' AS isA, wd AS w FROM (
           |    SELECT lang, unnest(string_split(text, ' ')) AS wd
           |    FROM documents) u
           |  WHERE wd <> ''),
           |hs AS (SELECT isA, w, greatest($h, 1) AS h FROM toks),
           |ka AS (SELECT DISTINCT h FROM hs WHERE isA ORDER BY h LIMIT $k),
           |kb AS (SELECT DISTINCT h FROM hs WHERE NOT isA ORDER BY h LIMIT $k),
           |un AS (SELECT DISTINCT h FROM (SELECT h FROM ka
           |       UNION ALL SELECT h FROM kb) ORDER BY h LIMIT $k),
           |st AS (SELECT CAST(count(*) AS BIGINT) AS ku,
           |              CAST(max(h) AS BIGINT) AS theta FROM un),
           |cm AS (SELECT CAST(count(*) AS BIGINT) AS common
           |       FROM ka JOIN kb USING (h) CROSS JOIN st
           |       WHERE h < theta),
           |ex AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS exact_union,
           |              CAST(count(DISTINCT CASE WHEN isA THEN w END)
           |                AS BIGINT) AS na,
           |              CAST(count(DISTINCT CASE WHEN NOT isA THEN w END)
           |                AS BIGINT) AS nb
           |       FROM toks)
           |SELECT ku, theta, common,
           |       CASE WHEN ku < $k THEN ku
           |            ELSE ($k - 1) * 281474976710656 // theta
           |       END AS union_est,
           |       common * 281474976710656 // theta AS inter_est,
           |       exact_union, na + nb - exact_union AS exact_inter
           |FROM st CROSS JOIN cm CROSS JOIN ex""".stripMargin
      }),

    // ── Incremental CC under edge inserts: standing labels for the
    //    chain-block graph arrive PRECOMPUTED (as production would hold
    //    them — yesterday's labeling at rest), then a DELTA batch (one
    //    bridge per block pair) merges neighbors — via the super-node
    //    graph only (O(|delta|) work), never re-touching base edges.
    //    The base graph is blocks of 50 consecutive doc_ids (edges
    //    id→id+1 except across id%50==49), so its exact CC labeling is
    //    analytic: cluster_id = id − id%50 (the block min — the same
    //    min-id contract every CC producer keeps; IncrementalCcFixture-
    //    Spec pins fixture == full StarComponents CC). Deriving labels
    //    in-query made the bench pay full CC + rebuild and overstated
    //    the operator's cost ~2.5× (r9 VERDICT task 2). Oracle: full CC
    //    over base ∪ delta, proving the increment is exact.
    QueryDef("q_incremental_cc",
      (s, d) => {
        val ids = Tables.documents(s, d).select(col("doc_id").as("id"))
        val labels = ids.select(col("id"),
          (col("id") - col("id") % 50).as("cluster_id"))
        val delta = ids.as("x")
          .join(ids.as("y"), col("y.id") === col("x.id") + 50)
          .filter(col("x.id") % 100 === 0)
          .select(col("x.id").as("a"), col("y.id").as("b"))
        graft.ops.StarComponents
          .incrementalConnectedComponents(labels, delta)
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("n_nodes"), min(col("id")).as("min_id"),
            max(col("id")).as("max_id"))
      },
      Some("""WITH RECURSIVE ids AS (SELECT doc_id AS id FROM documents),
             |base AS (SELECT x.id AS a, x.id + 1 AS b FROM ids x
             |         JOIN ids y ON y.id = x.id + 1 WHERE x.id % 50 <> 49),
             |delta AS (SELECT x.id AS a, x.id + 50 AS b FROM ids x
             |          JOIN ids y ON y.id = x.id + 50 WHERE x.id % 100 = 0),
             |e AS (SELECT a, b FROM base UNION ALL SELECT a, b FROM delta),
             |e2 AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
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
