package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.{Anomaly, BloomJoin, Bm25, FuzzyJoin, Graph, IntervalJoin,
  Sketches, Similarity, StarComponents, TimeSeries}

/** Round-3 operators (SURVEY.md §7.4c): O(log n) connected components,
  * Bloom-pruned joins, multi-canopy fuzzy matching, product-quantization
  * ANN, count-min heavy hitters, triangle counting, k-anonymity profiling,
  * and deterministic weighted sampling.
  */
object Round3Queries {
  import PortableSql.{hash48 => hash48Sql}

  def defs: Seq[QueryDef] = Seq(

    // ── Large-star/small-star connected components on a LONG-CHAIN graph
    //    (doc_id → doc_id+1, broken every 50 ids): component diameter ≈ 49
    //    exceeds min-label propagation's practical round budget, while the
    //    star algorithm closes it in O(log n) rounds ([[StarComponents]]).
    //    Observed as per-cluster size + id range.
    QueryDef("q_cc_star",
      (s, d) => {
        val ids = Tables.documents(s, d).select(col("doc_id").as("id"))
        val edges = ids.as("x").join(ids.as("y"), col("y.id") === col("x.id") + 1)
          .filter(col("x.id") % 50 =!= 49)
          .select(col("x.id").as("a"), col("y.id").as("b"))
        StarComponents.connectedComponents(ids, edges)
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("n_nodes"), min(col("id")).as("min_id"),
            max(col("id")).as("max_id"))
      },
      Some("""WITH RECURSIVE ids AS (SELECT doc_id AS id FROM documents),
             |e AS (SELECT x.id AS a, x.id + 1 AS b FROM ids x JOIN ids y ON y.id = x.id + 1
             |      WHERE x.id % 50 <> 49),
             |e2 AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
             |reach(id, label) AS (
             |  SELECT id, id FROM ids
             |  UNION
             |  SELECT e2.b, r.label FROM reach r JOIN e2 ON e2.a = r.id),
             |cc AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id)
             |SELECT cluster_id, count(*) AS n_nodes, min(id) AS min_id, max(id) AS max_id
             |FROM cc GROUP BY 1""".stripMargin)),

    // ── Bloom-pruned fact⋈dim join ([[BloomJoin]]): the fact side is
    //    filtered by a portable-hash Bloom bitmap of the dim keys BEFORE
    //    its shuffle; false positives are discarded by the real join, so
    //    the result is bit-identical to the plain join the oracle runs.
    QueryDef("q_bloom_join",
      (s, d) => {
        val dim = Tables.supplier(s, d).filter(col("s_nationkey") < 5)
          .select(col("s_suppkey"), col("s_name"))
        val fact = Tables.lineitem(s, d)
          .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        BloomJoin.pruneJoin(fact, dim, "l_suppkey", "s_suppkey")
          .groupBy(col("s_suppkey"), col("s_name"))
          .agg(count(lit(1)).as("n_items"),
            sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0)
              + lit(0.5)).cast("long")).as("revenue_c"))
      },
      Some("""SELECT s_suppkey, s_name, count(*) AS n_items,
             |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |WHERE s_nationkey < 5
             |GROUP BY 1, 2""".stripMargin)),

    // ── Multi-canopy fuzzy matching ([[FuzzyJoin.multiCanopy]]): dirty part
    //    names with head-char substitutions (escape the prefix canopy) and
    //    vowel swaps (escape nothing but exercise the phonetic canopy)
    //    resolved against the clean name list via prefix ∪ suffix ∪
    //    phonetic blocking + one exact edit-distance pass.
    QueryDef("q_fuzzy_canopy",
      (s, d) => {
        val p = Tables.part(s, d)
        val clean = p.select(col("p_name").as("k"))
        val headTypo = p.filter(col("p_partkey") % 4 === 0)
          .select(concat(lit("x"), expr("substring(p_name, 2, 1000000)")).as("k"))
        val vowelSwap = p.filter(col("p_partkey") % 4 === 1)
          .filter(instr(col("p_name"), "a") > 0)
          .select(concat(
            expr("substring(p_name, 1, instr(p_name, 'a') - 1)"), lit("e"),
            expr("substring(p_name, instr(p_name, 'a') + 1, 1000000)")).as("k"))
        FuzzyJoin.multiCanopy(clean, headTypo.unionByName(vowelSwap), "k")
      },
      Some("""WITH clean AS (SELECT DISTINCT p_name AS k FROM part),
             |d0 AS (SELECT concat('x', substr(p_name, 2, 1000000)) AS k
             |       FROM part WHERE p_partkey % 4 = 0),
             |d1 AS (SELECT concat(substr(p_name, 1, strpos(p_name, 'a') - 1), 'e',
             |                     substr(p_name, strpos(p_name, 'a') + 1, 1000000)) AS k
             |       FROM part WHERE p_partkey % 4 = 1 AND strpos(p_name, 'a') > 0),
             |dirty AS (SELECT DISTINCT k FROM (SELECT k FROM d0 UNION ALL SELECT k FROM d1) u),
             |cand AS (
             |  SELECT DISTINCT l.k AS l_key, r.k AS r_key FROM clean l JOIN dirty r
             |    ON substr(l.k, 1, 2) = substr(r.k, 1, 2)
             |  UNION
             |  SELECT DISTINCT l.k AS l_key, r.k AS r_key FROM clean l JOIN dirty r
             |    ON substr(l.k, -2, 2) = substr(r.k, -2, 2)
             |  UNION
             |  SELECT DISTINCT l.k AS l_key, r.k AS r_key FROM clean l JOIN dirty r
             |    ON concat(substr(l.k, 1, 1), regexp_replace(substr(l.k, 2, 1000000), '[aeiou]', '', 'g'))
             |     = concat(substr(r.k, 1, 1), regexp_replace(substr(r.k, 2, 1000000), '[aeiou]', '', 'g')))
             |SELECT l_key, r_key, CAST(levenshtein(l_key, r_key) AS BIGINT) AS dist
             |FROM cand WHERE levenshtein(l_key, r_key) <= 1""".stripMargin)),

    // ── Product-quantization ANN ([[Similarity.pqEncode]]/[[Similarity.pqTopK]]):
    //    64-dim vectors → 4 sub-codes from an 8-codeword codebook per
    //    subspace (codewords = slices of vec_id<8, the same deterministic
    //    convention as q_sim_ivf's centroids); asymmetric-distance top-5
    //    for the vec_id=0 query. Distances are exact e6-unit integers, so
    //    the ranking is engine-portable.
    QueryDef("q_sim_pq",
      (s, d) => {
        val e = Similarity.cast(Tables.embeddings(s, d)).select(col("vec_id"), col("ev"))
        val cb = e.filter(col("vec_id") < 8)
          .select(col("vec_id").cast("long").as("code"),
            explode(sequence(lit(0), lit(3))).as("sub"), col("ev"))
          .select(col("sub"), col("code"), expr("slice(ev, sub * 16 + 1, 16)").as("cw"))
        val q = e.filter(col("vec_id") === 0).select(col("ev").as("qv"))
        Similarity.pqTopK(Similarity.pqEncode(e, cb, 4, 64), cb, q, 4, 64, 5)
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
             |subs(sub) AS (VALUES (0), (1), (2), (3)),
             |cb AS (SELECT s.sub, e.vec_id AS code,
             |              list_slice(e.ev, s.sub * 16 + 1, s.sub * 16 + 16) AS cw
             |       FROM e CROSS JOIN subs s WHERE e.vec_id < 8),
             |sv AS (SELECT e.vec_id, s.sub, list_slice(e.ev, s.sub * 16 + 1, s.sub * 16 + 16) AS sv
             |       FROM e CROSS JOIN subs s),
             |asn AS (SELECT vec_id, sub, code FROM (
             |          SELECT sv.vec_id, sv.sub, cb.code,
             |                 row_number() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY
             |                   CAST(floor((list_dot_product(sv.sv, sv.sv)
             |                     - 2 * list_dot_product(sv.sv, cb.cw)
             |                     + list_dot_product(cb.cw, cb.cw)) * 1000000 + 0.5) AS BIGINT) ASC,
             |                   cb.code ASC) AS rn
             |          FROM sv JOIN cb ON sv.sub = cb.sub) t
             |        WHERE rn = 1),
             |q AS (SELECT ev AS qv FROM e WHERE vec_id = 0),
             |qs AS (SELECT s.sub, list_slice(q.qv, s.sub * 16 + 1, s.sub * 16 + 16) AS qsv
             |       FROM q CROSS JOIN subs s),
             |dt AS (SELECT cb.sub, cb.code,
             |              CAST(floor((list_dot_product(qs.qsv, qs.qsv)
             |                - 2 * list_dot_product(qs.qsv, cb.cw)
             |                + list_dot_product(cb.cw, cb.cw)) * 1000000 + 0.5) AS BIGINT) AS qd2_e6
             |       FROM qs JOIN cb ON qs.sub = cb.sub)
             |SELECT a.vec_id, CAST(sum(dt.qd2_e6) AS BIGINT) AS adc_d2_e6
             |FROM asn a JOIN dt ON a.sub = dt.sub AND a.code = dt.code
             |GROUP BY a.vec_id
             |ORDER BY adc_d2_e6 ASC, vec_id ASC LIMIT 5""".stripMargin)),

    // ── Count-min heavy hitters ([[Sketches]]): 3×64 integer counter table
    //    over event user_ids; the top-10 exact heavy hitters annotated with
    //    their (always ≥ exact) CMS estimates — the fixed-memory frequency
    //    path for unbounded key cardinality.
    QueryDef("q_cms_heavy",
      (s, d) => {
        val ev = Tables.events(s, d)
        val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
        val top = exact.orderBy(col("exact_cnt").desc, col("user_id").asc).limit(10)
          .localCheckpoint(false)
        Sketches.cmsEstimate(top, Sketches.cmsBuild(ev, "user_id"), "user_id")
          .join(top, "user_id")
          .select(col("user_id"), col("exact_cnt"), col("cms_est"))
      },
      Some {
        def h(j: Int) = hash48Sql("CAST(user_id AS VARCHAR)", s"'cms$j'")
        val unions = (0 until 3).map(j =>
          s"SELECT $j AS j, ${h(j)} % 64 AS bucket FROM events").mkString("\n UNION ALL\n ")
        val bucketCase = "CASE js.j " +
          (0 until 3).map(j => s"WHEN $j THEN ${h(j)} % 64").mkString(" ") + " END"
        s"""WITH ex AS (SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1),
           |top AS (SELECT * FROM ex ORDER BY exact_cnt DESC, user_id ASC LIMIT 10),
           |c AS (SELECT j, bucket, count(*) AS c FROM (
           | $unions) u GROUP BY 1, 2),
           |est AS (SELECT t.user_id, min(c.c) AS cms_est
           |        FROM top t CROSS JOIN (VALUES (0), (1), (2)) js(j)
           |        JOIN c ON c.j = js.j AND c.bucket = $bucketCase
           |        GROUP BY 1)
           |SELECT t.user_id, t.exact_cnt, e.cms_est
           |FROM top t JOIN est e ON t.user_id = e.user_id""".stripMargin
      }),

    // ── Exact triangle count ([[Graph.triangleCount]]) on a deterministic
    //    circulant graph over customer ids mod 100 (edges to +1 and +2 mod
    //    100 — every consecutive triple closes a triangle).
    QueryDef("q_triangle_count",
      (s, d) => {
        val nodes = Tables.customer(s, d)
          .select((col("c_custkey") % 100).as("id")).distinct()
        val edges = nodes.select(col("id").as("a"), ((col("id") + 1) % 100).as("b"))
          .unionByName(nodes.select(col("id").as("a"), ((col("id") + 2) % 100).as("b")))
        val nn = nodes.agg(count(lit(1)).as("n_nodes"))
        val ne = Graph.canonical(edges).agg(count(lit(1)).as("n_edges"))
        nn.crossJoin(ne).crossJoin(Graph.triangleCount(edges))
      },
      Some("""WITH nodes AS (SELECT DISTINCT c_custkey % 100 AS id FROM customer),
             |raw AS (SELECT id AS a, (id + 1) % 100 AS b FROM nodes
             |        UNION ALL SELECT id AS a, (id + 2) % 100 AS b FROM nodes),
             |e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM raw WHERE a <> b),
             |tri AS (SELECT count(*) AS n_triangles
             |        FROM e e1 JOIN e e2 ON e2.a = e1.b
             |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
             |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
             |       (SELECT count(*) FROM e) AS n_edges,
             |       tri.n_triangles
             |FROM tri""".stripMargin)),

    // ── k-anonymity profile over quasi-identifiers (nation, market
    //    segment): how many equivalence classes fall below k=5 and how many
    //    rows they expose — the privacy gate a curation pipeline runs
    //    before release.
    QueryDef("q_k_anonymity",
      (s, d) => Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("grp_sz"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("grp_sz") < 5, 1L).otherwise(0L)).as("groups_below_k"),
          sum(when(col("grp_sz") < 5, col("grp_sz")).otherwise(0L)).as("rows_at_risk"),
          min(col("grp_sz")).as("min_group_sz")),
      Some("""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS grp_sz
             |           FROM customer GROUP BY 1, 2)
             |SELECT count(*) AS n_groups,
             |       CAST(sum(CASE WHEN grp_sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS groups_below_k,
             |       CAST(sum(CASE WHEN grp_sz < 5 THEN grp_sz ELSE 0 END) AS BIGINT) AS rows_at_risk,
             |       min(grp_sz) AS min_group_sz
             |FROM g""".stripMargin)),

    // ── Deterministic weighted sampling: priority = content_hash div
    //    weight, bottom-k — heavier rows get systematically smaller
    //    priorities, and the decision replays identically under
    //    repartitioning/retries/engine swaps ([[graft.ops.Sampling]]'s
    //    hash-gate idea extended with weights).
    QueryDef("q_sample_weighted",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"))
        .withColumn("h", graft.ops.Dedup.hash48(
          concat(col("l_orderkey"), lit("-"), col("l_linenumber")), lit("wsamp")))
        .withColumn("pri", expr("h div qty"))
        .orderBy(col("pri").asc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(10)
        .select(col("l_orderkey"), col("l_linenumber"), col("qty"), col("pri")),
      Some {
        val h = hash48Sql(
          "concat(CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR))",
          "'wsamp'")
        s"""WITH t AS (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
           |                  $h AS h
           |           FROM lineitem)
           |SELECT l_orderkey, l_linenumber, qty, CAST(h // qty AS BIGINT) AS pri
           |FROM t ORDER BY pri ASC, l_orderkey ASC, l_linenumber ASC LIMIT 10""".stripMargin
      }),

    // ── BM25 top-10 with the fixed-point integer log ([[Bm25]]) — the
    //    portable-log design that closes the "no cross-engine ln()" gap
    //    TF-IDF documents. Every score is a BIGINT in e6 log₂ units.
    QueryDef("q_bm25_topk",
      (s, d) => Bm25.topK(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        Seq("spark", "join", "fast"), 10),
      Some {
        val log2 = Bm25.log2E6Sql("v")
        s"""WITH dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
           |            FROM documents),
           |n AS (SELECT count(*) AS n FROM documents),
           |l AS (SELECT CAST(sum(dl) AS BIGINT) AS l FROM dl),
           |tf AS (SELECT doc_id, wd AS word, count(*) AS tf
           |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents) u
           |       WHERE wd IN ('spark', 'join', 'fast')
           |       GROUP BY 1, 2),
           |df AS (SELECT word, count(*) AS bm_df FROM tf GROUP BY 1),
           |df2 AS (SELECT word, bm_df,
           |               1024 + (1024 * (2 * (n.n - bm_df) + 1)) // (2 * bm_df + 1) AS v
           |        FROM df, n),
           |idf AS (SELECT word, CAST($log2 - 10000000 AS BIGINT) AS idf_e6 FROM df2),
           |sc AS (SELECT tf.doc_id,
           |              CAST((idf.idf_e6 * 44 * l.l * tf.tf)
           |                // (20 * l.l * tf.tf + 6 * l.l + 18 * dl.dl * n.n) AS BIGINT) AS term_score
           |       FROM tf JOIN idf USING (word) JOIN dl USING (doc_id), n, l)
           |SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score_e6
           |FROM sc GROUP BY 1
           |ORDER BY score_e6 DESC, doc_id ASC LIMIT 10""".stripMargin
      }),

    // ── Exact-integer z-score outlier profile ([[Anomaly]]): the
    //    |x−μ| > 3σ test squared into wide-integer algebra so the decision
    //    can never flip on FP summation order — per event type.
    QueryDef("q_anomaly_zscore",
      (s, d) => Anomaly.zscoreProfile(Tables.events(s, d), "event_type", "value"),
      Some("""WITH c AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS x_c
             |           FROM events),
             |st AS (SELECT event_type, count(*) AS n, CAST(sum(x_c) AS BIGINT) AS s,
             |              CAST(sum(x_c * x_c) AS BIGINT) AS q
             |       FROM c GROUP BY 1),
             |j AS (SELECT c.event_type, c.x_c, st.n, st.s, st.q
             |      FROM c JOIN st USING (event_type))
             |SELECT event_type, max(n) AS n,
             |       CAST(sum(CASE WHEN CAST(n * x_c - s AS HUGEINT) * CAST(n * x_c - s AS HUGEINT)
             |                        > (CAST(n AS HUGEINT) * CAST(q AS HUGEINT)
             |                           - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) * 9
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM j GROUP BY 1""".stripMargin)),

    // ── Bucket-blocked batch interval self-join ([[IntervalJoin]]): pairs
    //    of orders from the same customer within 30 days — an equi-join on
    //    (customer, time-cell) instead of a per-customer cross join.
    QueryDef("q_interval_pairs",
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("es"))
        IntervalJoin.selfPairsWithin(o, "o_custkey", "o_orderkey", "es", 2592000L)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_pairs"))
      },
      Some("""WITH o AS (SELECT o_custkey, o_orderkey,
             |                  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS es FROM orders)
             |SELECT a.o_custkey, count(*) AS n_pairs
             |FROM o a JOIN o b ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
             |  AND abs(a.es - b.es) <= 2592000
             |GROUP BY 1""".stripMargin)),

    // ── Linear-interpolation gap fill ([[TimeSeries.interpolate]]): the
    //    forward-fill resample's sibling, with the one division done as
    //    floor(double) — exact while products stay under 2^53, identical
    //    under both engines' division semantics (truncating integer div
    //    would disagree with floor div on negative slopes).
    QueryDef("q_resample_interp",
      (s, d) => {
        val ev = Tables.events(s, d).withColumn("grp", col("user_id") % 3)
        TimeSeries.interpolate(
          TimeSeries.resample(ev, "grp", "ts", "value", 300L), "grp", 300L)
      },
      Some("""WITH r AS (SELECT user_id % 3 AS grp,
             |                  (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket_es,
             |                  count(*) AS cnt,
             |                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) * 100
             |                       // count(*) AS BIGINT) AS avg_e4
             |           FROM events GROUP BY 1, 2),
             |span AS (SELECT grp, min(bucket_es) AS b0, max(bucket_es) AS b1 FROM r GROUP BY 1),
             |spine AS (SELECT grp, unnest(range(b0, b1 + 300, 300)) AS bucket_es FROM span),
             |j AS (SELECT s.grp, s.bucket_es, coalesce(r.cnt, 0) AS cnt, r.avg_e4,
             |             CASE WHEN r.avg_e4 IS NOT NULL THEN s.bucket_es END AS obs_es
             |      FROM spine s LEFT JOIN r USING (grp, bucket_es)),
             |w AS (SELECT grp, bucket_es, cnt,
             |        last_value(avg_e4 IGNORE NULLS) OVER (PARTITION BY grp ORDER BY bucket_es
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
             |        last_value(obs_es IGNORE NULLS) OVER (PARTITION BY grp ORDER BY bucket_es
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t0,
             |        first_value(avg_e4 IGNORE NULLS) OVER (PARTITION BY grp ORDER BY bucket_es
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
             |        first_value(obs_es IGNORE NULLS) OVER (PARTITION BY grp ORDER BY bucket_es
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t1
             |      FROM j)
             |SELECT grp, bucket_es, cnt,
             |       CASE WHEN t0 IS NULL THEN v1
             |            WHEN t1 IS NULL OR t1 = t0 THEN v0
             |            ELSE v0 + CAST(floor(CAST((v1 - v0) * (bucket_es - t0) AS DOUBLE)
             |                                 / CAST(t1 - t0 AS DOUBLE)) AS BIGINT) END AS interp_e4
             |FROM w""".stripMargin)),

    // ── Multimodal frame sampling ([[graft.ops.Multimodal.sampleFrames]]):
    //    256-byte frames, every 2nd kept, sliced with a codegen'd binary
    //    substring — sample-before-decode. The oracle checks the size law
    //    arithmetically; the Spark side's frame_bytes comes from the REAL
    //    sliced bytes, so a slicing bug breaks the hash match.
    QueryDef("q_multimodal_frames",
      (s, d) => graft.ops.Multimodal.sampleFrames(
          graft.ops.Multimodal.attachPayload(
            Tables.documents(s, d).select(col("doc_id"), col("text"), col("source"))))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("frame_bytes")),
      Some("""WITH p AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
             |           FROM documents),
             |f AS (SELECT doc_id, n_bytes, (n_bytes + 255) // 256 AS n_frames FROM p),
             |i AS (SELECT doc_id, n_bytes, unnest(range(0, n_frames)) AS frame_idx FROM f)
             |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
             |       CAST(least(256, n_bytes - frame_idx * 256) AS BIGINT) AS frame_bytes
             |FROM i WHERE frame_idx % 2 = 0""".stripMargin)),

    // ── Multimodal resize stub ([[graft.ops.Multimodal.resizePartitions]]):
    //    partition-batched byte-stride downsample (a real codec drops into
    //    the same mapPartitions seam); the ⌈n/4⌉ size law is the oracle.
    QueryDef("q_multimodal_resize",
      (s, d) => graft.ops.Multimodal.resizePartitions(
          graft.ops.Multimodal.attachPayload(
            Tables.documents(s, d).select(col("doc_id"), col("text"), col("source"))))
        .select(col("doc_id"), col("n_bytes"), col("resized_bytes")),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |       CAST((octet_length(encode(text)) + 3) // 4 AS BIGINT) AS resized_bytes
             |FROM documents""".stripMargin)),

    // ── Distribution entropy profile via the fixed-point log₂ ([[Bm25]]'s
    //    log2E6 reused as a general portable-log primitive): per-class
    //    surprisal log₂(N/c) and its weighted entropy contribution, all
    //    BIGINT e6 units (v = 1024·N div c adds ≤ 1/1024 relative error —
    //    profiling-grade, and exactly reproducible).
    QueryDef("q_entropy_profile",
      (s, d) => {
        val ev = Tables.events(s, d)
        val n = ev.count()
        ev.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
          .withColumn("v", expr(s"(1024 * ${n}) div cnt"))
          .withColumn("surprisal_e6", Bm25.log2E6(col("v")) - lit(10000000L))
          .withColumn("entropy_contrib_e6", expr(s"(cnt * surprisal_e6) div ${n}"))
          .select(col("event_type"), col("cnt"), col("surprisal_e6"),
            col("entropy_contrib_e6"))
      },
      Some {
        val log2 = Bm25.log2E6Sql("v")
        s"""WITH n AS (SELECT count(*) AS n FROM events),
           |c AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1),
           |v AS (SELECT event_type, cnt, (1024 * n.n) // cnt AS v FROM c, n),
           |sp AS (SELECT event_type, cnt, CAST($log2 - 10000000 AS BIGINT) AS surprisal_e6, v
           |       FROM v)
           |SELECT sp.event_type, sp.cnt, sp.surprisal_e6,
           |       CAST((sp.cnt * sp.surprisal_e6) // n.n AS BIGINT) AS entropy_contrib_e6
           |FROM sp, n""".stripMargin
      }),

    // ── Corpus-boilerplate ratio ([[graft.ops.TextAnalysis.boilerplate]]):
    //    fraction of each doc's distinct 3-shingles that are corpus-top-100
    //    by df — the C4-style repeated-content filter, in exact e6 units.
    QueryDef("q_boilerplate",
      (s, d) => graft.ops.TextAnalysis.boilerplate(
        Tables.documents(s, d).select(col("doc_id"), col("text"))),
      Some("""WITH sh AS (SELECT DISTINCT doc_id,
             |                   unnest(list_transform(range(1, len(ws) - 1),
             |                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
             |            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) w
             |            WHERE len(ws) >= 3),
             |top AS (SELECT shingle, 1 AS is_top FROM (
             |          SELECT shingle, count(*) AS df FROM sh GROUP BY 1
             |          ORDER BY df DESC, shingle ASC LIMIT 100) t)
             |SELECT sh.doc_id, count(*) AS n_shingles,
             |       CAST(sum(coalesce(top.is_top, 0)) AS BIGINT) AS n_top,
             |       CAST((CAST(sum(coalesce(top.is_top, 0)) AS BIGINT) * 1000000)
             |            // count(*) AS BIGINT) AS boiler_e6
             |FROM sh LEFT JOIN top USING (shingle)
             |GROUP BY 1""".stripMargin)),

    // ── Cohort retention: users bucketed by first-seen week, activity
    //    counted per (cohort, weeks-since) cell — the standard retention
    //    matrix, all epoch-integer arithmetic. Two partial-aggregable
    //    passes (first-seen per user, then cell counts); the per-user
    //    firsts broadcast back.
    QueryDef("q_cohort_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_timestamp(col("ts")).as("es"))
        val first = ev.groupBy(col("user_id"))
          .agg(expr("min(es) div 604800").as("cohort_wk"))
        ev.withColumn("act_wk", expr("es div 604800"))
          .join(broadcast(first), "user_id")
          .groupBy(col("cohort_wk"), (col("act_wk") - col("cohort_wk")).as("weeks_since"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
      },
      Some("""WITH ev AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
             |f AS (SELECT user_id, min(es) // 604800 AS cohort_wk FROM ev GROUP BY 1)
             |SELECT f.cohort_wk, (ev.es // 604800) - f.cohort_wk AS weeks_since,
             |       count(DISTINCT ev.user_id) AS n_users, count(*) AS n_events
             |FROM ev JOIN f USING (user_id)
             |GROUP BY 1, 2""".stripMargin)),

    // ── NTILE decile bucketing: customers ranked into 10 equal-size
    //    account-balance bands — the quantile-bucketing window function
    //    (ties broken by key for a deterministic band edge), observed as
    //    per-band size + cent-exact balance range.
    QueryDef("q_ntile_buckets",
      (s, d) => {
        // ntile(10) computed ARITHMETICALLY from the distributed global
        // rank (Ranks.globalRowNumber — range partitions + offsets), not
        // from an unpartitioned window: identical bucket assignment
        // (SQL ntile semantics: first n%10 buckets get one extra row),
        // but no single-partition sort of the whole table.
        val ranked = graft.ops.Ranks.globalRowNumber(
          Tables.customer(s, d)
            .select(col("c_custkey"),
              floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal_c")),
          Seq(col("bal_c").asc, col("c_custkey").asc), "r")
        // count from the BASE frame (a bare scan), not `ranked` — the
        // latter would re-plan the whole rank subtree under the broadcast
        val tot = Tables.customer(s, d).agg(count(lit(1)).as("nt"))
        ranked.crossJoin(broadcast(tot))
          .withColumn("decile", expr(
            """CASE WHEN r <= (nt % 10) * (nt div 10 + 1)
              |     THEN (r - 1) div (nt div 10 + 1) + 1
              |     ELSE (nt % 10) +
              |          (r - (nt % 10) * (nt div 10 + 1) - 1) div (nt div 10) + 1
              |END""".stripMargin).cast("long"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n"), min(col("bal_c")).as("min_bal_c"),
            max(col("bal_c")).as("max_bal_c"))
      },
      Some("""WITH t AS (SELECT c_custkey,
             |                  CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
             |           FROM customer),
             |d AS (SELECT bal_c,
             |             CAST(ntile(10) OVER (ORDER BY bal_c ASC, c_custkey ASC) AS BIGINT) AS decile
             |      FROM t)
             |SELECT decile, count(*) AS n, min(bal_c) AS min_bal_c, max(bal_c) AS max_bal_c
             |FROM d GROUP BY 1""".stripMargin)),

    // ── Incremental dedup ([[graft.ops.Dedup.incrementalStatus]]): a
    //    synthetic "daily batch" (exact copies, tail-edited near-dups,
    //    reversed-text novels) classified against the corpus — incoming
    //    bands join CORPUS bands, never a corpus self-join.
    QueryDef("q_dedup_incremental",
      (s, d) => {
        val corpus = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val inc = corpus.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
          .unionByName(corpus.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" graft tail xyz")).as("text")))
          .unionByName(corpus.filter(col("doc_id") % 13 === 0)
            .select((col("doc_id") + 4000000L).as("doc_id"),
              reverse(col("text")).as("text")))
        graft.ops.Dedup.incrementalStatus(inc, corpus)
      },
      Some {
        val mh = PortableSql.hexSliceToLong("hx", "j * 8")
        def sigSql(src: String) =
          s"""(WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM $src),
             |sh AS (SELECT doc_id,
             |              unnest(list_transform(range(1, len(ws) - 1),
             |                     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
             |       FROM w WHERE len(ws) >= 3),
             |sh2 AS (SELECT doc_id, concat(md5(shingle), md5(concat('x', shingle))) AS hx FROM sh)
             |SELECT doc_id, j, min($mh) AS mh
             |FROM sh2 CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) hj(j)
             |GROUP BY doc_id, j)""".stripMargin
        def bandSql(sig: String) =
          s"""(SELECT doc_id, j // 2 AS band,
             |        concat(CAST(min(CASE WHEN j % 2 = 0 THEN mh END) AS VARCHAR), ':',
             |               CAST(min(CASE WHEN j % 2 = 1 THEN mh END) AS VARCHAR)) AS bv
             | FROM $sig GROUP BY doc_id, j // 2)""".stripMargin
        s"""WITH corpus AS (SELECT doc_id, text FROM documents),
           |inc AS (
           |  SELECT doc_id + 3000000 AS doc_id, text FROM corpus WHERE doc_id % 11 = 0
           |  UNION ALL
           |  SELECT doc_id + 2000000 AS doc_id, text || ' graft tail xyz' AS text
           |  FROM corpus WHERE doc_id % 5 = 0
           |  UNION ALL
           |  SELECT doc_id + 4000000 AS doc_id, reverse(text) AS text
           |  FROM corpus WHERE doc_id % 13 = 0),
           |ex AS (SELECT DISTINCT i.doc_id FROM inc i
           |       JOIN (SELECT DISTINCT md5(text) AS m FROM corpus) c ON md5(i.text) = c.m),
           |sigI AS (SELECT * FROM ${sigSql("inc")} t),
           |sigC AS (SELECT * FROM ${sigSql("corpus")} t),
           |bI AS (SELECT * FROM ${bandSql("sigI")} t),
           |bC AS (SELECT * FROM ${bandSql("sigC")} t),
           |cand AS (SELECT DISTINCT a.doc_id AS in_id, b.doc_id AS corp_id
           |         FROM bI a JOIN bC b ON a.band = b.band AND a.bv = b.bv),
           |near AS (SELECT DISTINCT in_id AS doc_id FROM (
           |           SELECT c.in_id, c.corp_id
           |           FROM cand c
           |           JOIN sigI x ON x.doc_id = c.in_id
           |           JOIN sigC y ON y.doc_id = c.corp_id AND y.j = x.j
           |           GROUP BY c.in_id, c.corp_id
           |           HAVING sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) >= 6) t)
           |SELECT i.doc_id,
           |       CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
           |            WHEN near.doc_id IS NOT NULL THEN 'near_dup'
           |            ELSE 'novel' END AS status
           |FROM inc i
           |LEFT JOIN ex ON i.doc_id = ex.doc_id
           |LEFT JOIN near ON i.doc_id = near.doc_id""".stripMargin
      })
  )
}
