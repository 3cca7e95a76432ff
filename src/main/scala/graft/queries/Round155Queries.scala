package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Round-155 batch:
  *
  *  - IVF nprobe curve (`q_ivf_nprobe_curve`): recall@5 AND candidate
  *    count as the probe width sweeps 1→8 cells — the cost/recall
  *    tradeoff curve an ANN index is tuned by (q_sim_recall pins one
  *    point; the curve shows the knee). One assignment pass, one brute
  *    baseline; the sweep itself rides broadcast frames.
  *  - Bradley–Terry strengths (`q_bradley_terry`): within each order
  *    the max-price line's brand "beats" the min-price line's brand;
  *    one minorization-maximization update from uniform strengths
  *    gives the closed-form s_i = w_i / Σ_j n_ij/(s_i+s_j) — the
  *    paired-comparison ranking model behind every match-up
  *    leaderboard. Deterministic winners via struct ordering (price,
  *    linenumber, brand) — no max_by tie ambiguity.
  *  - Depth-2 decision tree (`q_tree_depth2`): exact greedy induction
  *    over a fixed 6-split candidate grid (hour ≤ {6,12,18}, cents ≤
  *    {2500,5000,7500}) minimizing weighted Gini, then the best split
  *    per child — real ML training as three aggregate-argmin rounds,
  *    no collect, no iteration beyond the fixed depth.
  */
object Round155Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── IVF nprobe sweep: centroids = first 8 vectors; query = vec 0;
    //    per np ∈ {1,2,4,8}: search the np nearest cells, take top-5
    //    by rounded cosine, report candidates scanned + recall vs the
    //    brute top-5.
    QueryDef("q_ivf_nprobe_curve",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = Similarity.cast(Tables.embeddings(s, d))
          .select(col("vec_id"), col("ev"))
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("ev").as("cv"))
        val asn = Similarity.ivfAssign(e, cents).localCheckpoint(false)
        val q = asn.filter(col("vec_id") === 0)
          .select(col("ev").as("qv")).localCheckpoint(false)
        // centroid ranking for the query (probe order)
        val qc = cents.crossJoin(broadcast(q))
          .withColumn("ccos", Similarity.cosine(col("cv"), col("qv")))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("ccos").desc, col("c_id"))))
          .select(col("c_id"), col("rn"))
        val brute = e.crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(Similarity.cosine(col("ev"), col("qv")), 6).as("cos"))
          .orderBy(col("cos").desc, col("vec_id")).limit(5)
          .select(col("vec_id")).localCheckpoint(false)
        val nps = s.range(0, 4).selectExpr(
          "CAST(shiftleft(1, CAST(id AS INT)) AS BIGINT) AS np")
        val cand = asn.join(broadcast(qc), "c_id")
          .crossJoin(broadcast(nps)).filter(col("rn") <= col("np"))
          .crossJoin(broadcast(q))
          .select(col("np"), col("vec_id"),
            round(Similarity.cosine(col("ev"), col("qv")), 6).as("cos"))
          .localCheckpoint(false)
        val ncand = cand.groupBy(col("np")).agg(count(lit(1)).as("n_cand"))
        val top5 = cand.withColumn("rk", row_number().over(
            Window.partitionBy(col("np"))
              .orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rk") <= 5)
        val hits = top5.join(broadcast(brute), "vec_id")
          .groupBy(col("np")).agg(count(lit(1)).as("n_hits"))
        ncand.join(hits, Seq("np"), "left")
          .selectExpr("np AS nprobe", "CAST(n_cand AS BIGINT) AS n_cand",
            "CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits",
            "coalesce(n_hits, 0) * 200000 AS recall_e6")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
             |           FROM embeddings),
             |cents AS (SELECT vec_id AS c_id, ev AS cv FROM e
             |          WHERE vec_id < 8),
             |asn AS (SELECT vec_id, ev, c_id FROM (
             |          SELECT e.vec_id, e.ev, c.c_id,
             |                 row_number() OVER (PARTITION BY e.vec_id
             |                   ORDER BY list_dot_product(e.ev, c.cv) /
             |                     (sqrt(list_dot_product(e.ev, e.ev))
             |                      * sqrt(list_dot_product(c.cv, c.cv)))
             |                     DESC, c.c_id ASC) AS rn
             |          FROM e CROSS JOIN cents c) t WHERE rn = 1),
             |q AS (SELECT ev AS qv FROM asn WHERE vec_id = 0),
             |qc AS (SELECT c_id, row_number() OVER (
             |         ORDER BY list_dot_product(c.cv, q.qv) /
             |           (sqrt(list_dot_product(c.cv, c.cv))
             |            * sqrt(list_dot_product(q.qv, q.qv))) DESC,
             |           c.c_id ASC) AS rn
             |       FROM cents c CROSS JOIN q),
             |brute AS (SELECT e.vec_id FROM e CROSS JOIN q
             |          ORDER BY round(list_dot_product(e.ev, q.qv) /
             |            (sqrt(list_dot_product(e.ev, e.ev))
             |             * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
             |            e.vec_id ASC LIMIT 5),
             |nps AS (SELECT CAST(unnest([1, 2, 4, 8]) AS BIGINT) AS np),
             |cand AS (SELECT nps.np, a.vec_id,
             |                round(list_dot_product(a.ev, q.qv) /
             |                  (sqrt(list_dot_product(a.ev, a.ev))
             |                   * sqrt(list_dot_product(q.qv, q.qv))), 6)
             |                  AS cos
             |         FROM asn a JOIN qc ON a.c_id = qc.c_id
             |         CROSS JOIN nps CROSS JOIN q
             |         WHERE qc.rn <= nps.np),
             |nc AS (SELECT np, CAST(count(*) AS BIGINT) AS n_cand
             |       FROM cand GROUP BY 1),
             |top5 AS (SELECT np, vec_id FROM cand
             |         QUALIFY row_number() OVER (PARTITION BY np
             |           ORDER BY cos DESC, vec_id ASC) <= 5),
             |h AS (SELECT np, CAST(count(*) AS BIGINT) AS n_hits
             |      FROM top5 JOIN brute USING (vec_id) GROUP BY 1)
             |SELECT nc.np AS nprobe, nc.n_cand,
             |       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
             |       coalesce(h.n_hits, 0) * 200000 AS recall_e6
             |FROM nc LEFT JOIN h ON nc.np = h.np""".stripMargin)),

    // ── Bradley–Terry: wins from within-order max/min-price brand
    //    pairs; one MM update from uniform strengths, normalized e6.
    QueryDef("q_bradley_terry",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"),
            expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
              .as("c"),
            col("l_linenumber").as("ln"), col("p_brand").as("b"))
          .localCheckpoint(false) // feeds BOTH rank windows below
        // winner/loser via rank windows, NOT struct-max aggregates: the
        // aggregate form is semantically identical but DuckDB's struct
        // max goes superlinear at sf0.1 (minutes for 600k rows) — the
        // window form is one sort per side in both engines
        import org.apache.spark.sql.expressions.Window
        val byOk = Window.partitionBy(col("ok"))
        val wtab = li.withColumn("rk", row_number().over(
            byOk.orderBy(col("c").desc, col("ln").desc, col("b").desc)))
          .filter(col("rk") === 1).select(col("ok"), col("b").as("w"))
        val ltab = li.withColumn("rk", row_number().over(
            byOk.orderBy(col("c"), col("ln"), col("b"))))
          .filter(col("rk") === 1).select(col("ok"), col("b").as("l"))
        val m = wtab.join(ltab, "ok")
          .filter(col("w") =!= col("l"))
          .localCheckpoint(false)
        val wins = m.groupBy(col("w").as("b")).agg(count(lit(1)).as("wins"))
        val pairs = m.select(least(col("w"), col("l")).as("u"),
            greatest(col("w"), col("l")).as("v"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n"))
        val sided = pairs.select(col("u").as("b"), col("n"))
          .unionByName(pairs.select(col("v").as("b"), col("n")))
        val den = sided.groupBy(col("b"))
          .agg(sum(expr("(n * 1000000) div 2000000")).as("den"))
        val s1 = den.join(wins, Seq("b"), "left")
          .selectExpr("b", "coalesce(wins, 0L) AS wins", "den",
            "coalesce(wins, 0L) * 1000000 div greatest(1L, den) AS s1")
        s1.crossJoin(broadcast(s1.agg(sum(col("s1")).as("st"))))
          .selectExpr("b AS brand", "CAST(wins AS BIGINT) AS n_wins",
            "CAST(den AS BIGINT) AS half_matches",
            "s1 * 1000000 div greatest(1L, st) AS strength_e6")
      },
      Some("""WITH li AS (
             |  SELECT l.l_orderkey AS ok,
             |         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
             |           AS c,
             |         l.l_linenumber AS ln, p.p_brand AS b
             |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
             |wtab AS (SELECT ok, b AS w FROM li
             |         QUALIFY row_number() OVER (PARTITION BY ok
             |           ORDER BY c DESC, ln DESC, b DESC) = 1),
             |ltab AS (SELECT ok, b AS l FROM li
             |         QUALIFY row_number() OVER (PARTITION BY ok
             |           ORDER BY c ASC, ln ASC, b ASC) = 1),
             |mm AS (SELECT w, l FROM wtab JOIN ltab USING (ok)
             |       WHERE w <> l),
             |wins AS (SELECT w AS b, CAST(count(*) AS BIGINT) AS wins
             |         FROM mm GROUP BY 1),
             |pairs AS (SELECT least(w, l) AS u, greatest(w, l) AS v,
             |                 CAST(count(*) AS BIGINT) AS n
             |          FROM mm GROUP BY 1, 2),
             |sided AS (SELECT u AS b, n FROM pairs
             |          UNION ALL SELECT v AS b, n FROM pairs),
             |den AS (SELECT b, CAST(sum((n * 1000000) // 2000000)
             |          AS BIGINT) AS den
             |        FROM sided GROUP BY 1),
             |s1 AS (SELECT den.b, coalesce(wins.wins, 0) AS wins, den.den,
             |         coalesce(wins.wins, 0) * 1000000
             |           // greatest(1, den.den) AS s1
             |       FROM den LEFT JOIN wins ON den.b = wins.b),
             |st AS (SELECT CAST(sum(s1) AS BIGINT) AS st FROM s1)
             |SELECT s1.b AS brand, CAST(s1.wins AS BIGINT) AS n_wins,
             |       s1.den AS half_matches,
             |       s1.s1 * 1000000 // greatest(1, st.st) AS strength_e6
             |FROM s1 CROSS JOIN st""".stripMargin)),

    // ── Depth-2 greedy tree on events: label = purchase; candidates =
    //    {hour ≤ 6/12/18, cents ≤ 2500/5000/7500}; split score =
    //    Σ_side 2·pos·neg·1e6 div n_side, then div n — weighted Gini
    //    in pure integers; argmin ties → feature asc, threshold asc.
    QueryDef("q_tree_depth2",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.events(s, d)
          .selectExpr(
            "(unix_micros(ts) div 3600000000) % 24 AS hour",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
            "CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END AS y")
          .localCheckpoint(false)
        val cands = s.range(0, 6).selectExpr(
          "CASE WHEN id < 3 THEN 'hour' ELSE 'cents' END AS f",
          "CASE WHEN id < 3 THEN (id + 1) * 6 ELSE (id - 2) * 2500 END AS thr")
        def best(df: org.apache.spark.sql.DataFrame, node: String) = {
          val scored = df.crossJoin(broadcast(cands))
            .selectExpr("f", "thr",
              "CASE WHEN (f = 'hour' AND hour <= thr) OR " +
                "(f = 'cents' AND cents <= thr) THEN 1 ELSE 0 END AS lft",
              "y")
            .groupBy(col("f"), col("thr"))
            .agg(sum(col("lft")).as("nl"),
              sum(col("lft") * col("y")).as("pl"),
              sum(lit(1L) - col("lft")).as("nr"),
              sum((lit(1L) - col("lft")) * col("y")).as("pr"),
              count(lit(1)).as("n"), sum(col("y")).as("np"))
            .selectExpr("f", "thr", "n", "np",
              """(2 * pl * (nl - pl) * 1000000 div greatest(1L, nl)
                | + 2 * pr * (nr - pr) * 1000000 div greatest(1L, nr))
                | div n AS score_e6""".stripMargin)
          scored.withColumn("rk", row_number().over(
              Window.orderBy(col("score_e6"), col("f"), col("thr"))))
            .filter(col("rk") === 1)
            .selectExpr(s"'$node' AS node", "f AS feature",
              "CAST(thr AS BIGINT) AS threshold", "score_e6",
              "CAST(n AS BIGINT) AS n", "CAST(np AS BIGINT) AS n_pos")
        }
        val root = best(base, "root").localCheckpoint(false)
        val withSide = base.crossJoin(broadcast(
            root.selectExpr("feature AS rf", "threshold AS rt")))
          .selectExpr("hour", "cents", "y",
            "CASE WHEN (rf = 'hour' AND hour <= rt) OR " +
              "(rf = 'cents' AND cents <= rt) THEN 1 ELSE 0 END AS side")
        root.unionByName(best(withSide.filter(col("side") === 1), "left"))
          .unionByName(best(withSide.filter(col("side") === 0), "right"))
      },
      Some {
        def bestSql(src: String, node: String): String =
          s"""SELECT '$node' AS node, f AS feature,
             |       CAST(thr AS BIGINT) AS threshold, score_e6,
             |       CAST(n AS BIGINT) AS n, CAST(np AS BIGINT) AS n_pos
             |FROM (
             |  SELECT f, thr, n, np,
             |         (2 * pl * (nl - pl) * 1000000 // greatest(1, nl)
             |          + 2 * pr * (nr - pr) * 1000000 // greatest(1, nr))
             |          // n AS score_e6
             |  FROM (
             |    SELECT c.f, c.thr,
             |           CAST(sum(CASE WHEN (c.f = 'hour' AND b.hour <= c.thr)
             |             OR (c.f = 'cents' AND b.cents <= c.thr)
             |             THEN 1 ELSE 0 END) AS BIGINT) AS nl,
             |           CAST(sum(CASE WHEN (c.f = 'hour' AND b.hour <= c.thr)
             |             OR (c.f = 'cents' AND b.cents <= c.thr)
             |             THEN b.y ELSE 0 END) AS BIGINT) AS pl,
             |           CAST(sum(CASE WHEN (c.f = 'hour' AND b.hour <= c.thr)
             |             OR (c.f = 'cents' AND b.cents <= c.thr)
             |             THEN 0 ELSE 1 END) AS BIGINT) AS nr,
             |           CAST(sum(CASE WHEN (c.f = 'hour' AND b.hour <= c.thr)
             |             OR (c.f = 'cents' AND b.cents <= c.thr)
             |             THEN 0 ELSE b.y END) AS BIGINT) AS pr,
             |           CAST(count(*) AS BIGINT) AS n,
             |           CAST(sum(b.y) AS BIGINT) AS np
             |    FROM $src b CROSS JOIN cands c GROUP BY 1, 2) agg) sc
             |QUALIFY row_number() OVER (ORDER BY score_e6, f, thr) = 1"""
            .stripMargin
        s"""WITH base AS (
           |  SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
           |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
           |           AS y
           |  FROM events),
           |cands AS (SELECT CASE WHEN i < 3 THEN 'hour' ELSE 'cents' END
           |            AS f,
           |          CASE WHEN i < 3 THEN (i + 1) * 6
           |            ELSE (i - 2) * 2500 END AS thr
           |          FROM (SELECT unnest(generate_series(0, 5)) AS i)),
           |root AS (${bestSql("base", "root")}),
           |sided AS (SELECT b.hour, b.cents, b.y,
           |            CASE WHEN (r.feature = 'hour' AND b.hour
           |              <= r.threshold) OR (r.feature = 'cents'
           |              AND b.cents <= r.threshold) THEN 1 ELSE 0 END
           |              AS side
           |          FROM base b CROSS JOIN root r),
           |lhs AS (SELECT hour, cents, y FROM sided WHERE side = 1),
           |rhs AS (SELECT hour, cents, y FROM sided WHERE side = 0),
           |lbest AS (${bestSql("lhs", "left")}),
           |rbest AS (${bestSql("rhs", "right")})
           |SELECT * FROM root UNION ALL SELECT * FROM lbest
           |UNION ALL SELECT * FROM rbest""".stripMargin
      })
  )
}
