package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Round-148 batch: graph-ranked keywords (TextRank — weighted
  * PageRank over the adjacent-token co-occurrence graph, the classic
  * unsupervised keyword extractor), one synchronous Louvain move round
  * (each node, starting in its own singleton community, adopts the
  * neighbor community with the best modularity gain — the inner step
  * of the standard community-detection algorithm), and a theta-lite
  * forecast (SES half-alpha level + half the OLS trend — the
  * M3-winning theta method's additive decomposition) per event type.
  *
  * All-integer arithmetic (e6 ranks, cents, sign-factored truncating
  * division) so every oracle is bit-exact. Scale notes: TextRank's
  * graph is capped at the top-60 vocabulary — token counting is one
  * hash aggregate over the corpus, everything after runs on a
  * fixed-size graph; Louvain's candidate set is each node's neighbor
  * list (no all-pairs term); the theta forecast is two keyed
  * aggregates over a daily pre-rollup.
  */
object Round148Queries {

  /** Unrolled weighted-PageRank CTE chain (mirrors
    * [[Graph.pageRankWeighted]]'s truncating-integer round) appended
    * after `nodes(id)` / `edges(src, dst, w)` CTEs. */
  private def prChainSql(iters: Int): String = {
    val head =
      """sw AS (SELECT src, CAST(sum(w) AS BIGINT) AS sw FROM edges GROUP BY 1),
        |ed AS (SELECT e.src, e.dst, e.w, sw.sw FROM edges e JOIN sw USING (src)),
        |p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes)"""
        .stripMargin
    val its = (1 to iters).map { k =>
      s"""p$k AS (SELECT n.id,
         |  CAST(150000 + (85 * COALESCE(m.s, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN (SELECT ed.dst, sum((p.pr * ed.w) // ed.sw) AS s
         |                          FROM ed JOIN p${k - 1} p ON p.id = ed.src
         |                          GROUP BY ed.dst) m ON m.dst = n.id)"""
        .stripMargin
    }
    (head +: its).mkString(",\n")
  }

  def defs: Seq[QueryDef] = Seq(

    // ── TextRank keywords: vocabulary = top-60 tokens by corpus count
    //    (ties broken alphabetically); edges = adjacent-token pairs
    //    with both ends in-vocab, symmetrized with co-occurrence
    //    weights; 4 truncating-integer PageRank rounds; top 15 words.
    QueryDef("q_textrank",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(split(col("text"), " ").as("ws"))
          .localCheckpoint(false)
        val vocab = toks.select(explode(col("ws")).as("wd"))
          .filter(col("wd") =!= "")
          .groupBy(col("wd")).agg(count(lit(1)).as("cnt"))
        import org.apache.spark.sql.expressions.Window
        // global top-60 by count: the rank window runs on the
        // aggregated vocabulary (≤ distinct-token cardinality), and
        // the 60-row result broadcasts everywhere downstream
        val top = vocab.withColumn("rk",
            row_number().over(Window.orderBy(col("cnt").desc, col("wd"))))
          .filter(col("rk") <= 60).select(col("wd"))
        val pairs = toks.filter(size(col("ws")) >= 2)
          .select(explode(expr(
            "transform(sequence(0, size(ws) - 2), i -> named_struct('a', ws[i], 'b', ws[i + 1]))"))
            .as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .filter(col("a") =!= "" && col("b") =!= "" && col("a") =!= col("b"))
          .join(broadcast(top.select(col("wd").as("a"))), "a")
          .join(broadcast(top.select(col("wd").as("b"))), "b")
        val und = pairs
          .select(least(col("a"), col("b")).as("u"),
            greatest(col("a"), col("b")).as("v"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
        val edges = und.select(col("u").as("src"), col("v").as("dst"), col("w"))
          .unionByName(und.select(col("v").as("src"), col("u").as("dst"),
            col("w")))
        val nodes = top.select(col("wd").as("id"))
        Graph.pageRankWeighted(nodes, edges, 4)
          .select(col("id").as("word"), col("pr_e6"))
          .orderBy(col("pr_e6").desc, col("word")).limit(15)
      },
      Some(s"""WITH t AS MATERIALIZED (
              |  SELECT string_split(text, ' ') AS ws FROM documents),
              |uni AS (SELECT wd, CAST(count(*) AS BIGINT) AS cnt
              |        FROM (SELECT unnest(ws) AS wd FROM t) u
              |        WHERE wd <> '' GROUP BY 1),
              |nodes AS (SELECT wd AS id FROM uni
              |          QUALIFY row_number() OVER (ORDER BY cnt DESC, wd) <= 60),
              |pr0 AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
              |          i -> struct_pack(a := ws[i], b := ws[i + 1]))) AS bb
              |        FROM t WHERE len(ws) >= 2),
              |pf AS (SELECT bb.a AS a, bb.b AS b FROM pr0
              |       WHERE bb.a <> '' AND bb.b <> '' AND bb.a <> bb.b
              |         AND bb.a IN (SELECT id FROM nodes)
              |         AND bb.b IN (SELECT id FROM nodes)),
              |und AS (SELECT least(a, b) AS u, greatest(a, b) AS v,
              |               CAST(count(*) AS BIGINT) AS w
              |        FROM pf GROUP BY 1, 2),
              |edges AS (SELECT u AS src, v AS dst, w FROM und
              |          UNION ALL
              |          SELECT v AS src, u AS dst, w FROM und),
              |${prChainSql(4)}
              |SELECT id AS word, pr AS pr_e6 FROM p4
              |ORDER BY pr_e6 DESC, word LIMIT 15""".stripMargin)),

    // ── One synchronous Louvain move round on the 100-node circulant
    //    test graph (parallel-edge multiplicity = edge weight): every
    //    node starts in its own singleton community and adopts
    //    argmax_j of score = 2m·w(i,j) − k_i·k_j when positive (the
    //    exact singleton-case modularity gain, scaled by 2m²), ties →
    //    smallest neighbor id. Candidates are only graph neighbors —
    //    no all-pairs term at any scale.
    QueryDef("q_louvain_pass",
      (s, d) => {
        val nodes = Tables.part(s, d)
          .select((col("p_partkey") % 100).as("id")).distinct()
        val dir = nodes.select(col("id").as("src"),
            ((col("id") + 1) % 100).as("dst"))
          .unionByName(nodes.filter(col("id") % 2 === 0)
            .select(col("id").as("src"),
              ((col("id") * 7 + 3) % 100).as("dst")))
        // checkpoint the tiny symmetric adjacency + degree frames so the
        // three consumers below don't each replay the scan→agg lineage
        val und = dir
          .select(least(col("src"), col("dst")).as("u"),
            greatest(col("src"), col("dst")).as("v"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
          .localCheckpoint(false)
        val adj = und.select(col("u").as("i"), col("v").as("j"), col("w"))
          .unionByName(und.select(col("v").as("i"), col("u").as("j"),
            col("w")))
        val deg = adj.groupBy(col("i")).agg(sum(col("w")).as("k"))
          .localCheckpoint(false)
        val m2 = deg.agg(sum(col("k")).as("m2"))
        val scored = adj
          .join(broadcast(deg), "i")
          .join(broadcast(deg.select(col("i").as("j"), col("k").as("kj"))),
            "j")
          .crossJoin(broadcast(m2))
          .select(col("i"), col("j"),
            (col("m2") * col("w") - col("k") * col("kj")).as("score"))
        import org.apache.spark.sql.expressions.Window
        val pick = scored.withColumn("rk",
            row_number().over(Window.partitionBy(col("i"))
              .orderBy(col("score").desc, col("j"))))
          .filter(col("rk") === 1)
          .select(col("i"),
            when(col("score") > 0L, col("j")).otherwise(col("i"))
              .as("comm"))
        nodes.join(broadcast(pick), nodes("id") === pick("i"), "left")
          .select(nodes("id").cast("long").as("id"),
            coalesce(col("comm"), nodes("id")).cast("long").as("comm"))
          .orderBy(col("id"))
      },
      Some("""WITH nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
             |dir AS (SELECT id AS src, (id + 1) % 100 AS dst FROM nodes
             |        UNION ALL
             |        SELECT id AS src, (id * 7 + 3) % 100 AS dst
             |        FROM nodes WHERE id % 2 = 0),
             |und AS (SELECT least(src, dst) AS u, greatest(src, dst) AS v,
             |               CAST(count(*) AS BIGINT) AS w
             |        FROM dir GROUP BY 1, 2),
             |adj AS (SELECT u AS i, v AS j, w FROM und
             |        UNION ALL SELECT v AS i, u AS j, w FROM und),
             |deg AS (SELECT i, CAST(sum(w) AS BIGINT) AS k FROM adj GROUP BY 1),
             |m2 AS (SELECT CAST(sum(k) AS BIGINT) AS m2 FROM deg),
             |scored AS (SELECT a.i, a.j,
             |             m2.m2 * a.w - di.k * dj.k AS score
             |           FROM adj a JOIN deg di ON a.i = di.i
             |           JOIN deg dj ON a.j = dj.i CROSS JOIN m2),
             |pick AS (SELECT i, CASE WHEN score > 0 THEN j ELSE i END AS comm
             |         FROM scored
             |         QUALIFY row_number() OVER (PARTITION BY i
             |           ORDER BY score DESC, j) = 1)
             |SELECT CAST(n.id AS BIGINT) AS id,
             |       CAST(COALESCE(p.comm, n.id) AS BIGINT) AS comm
             |FROM nodes n LEFT JOIN pick p ON n.id = p.i
             |ORDER BY id""".stripMargin)),

    // ── Theta-lite forecast per event type over the daily revenue
    //    series: level = SES with alpha = 1/2 (the (acc+x)//2 fold,
    //    exactly q_ewma_smooth's recursion), drift = OLS slope over
    //    the observed-day index, forecast(h) = level + (slope·h)/2 —
    //    the theta method's equal-weight combination of the theta=0
    //    and theta=2 lines. Slope divisions double-truncate
    //    (num // max(1, den // 1e6)) identically in both engines.
    QueryDef("q_theta_forecast",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("dy"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
          .groupBy(col("event_type"), col("dy"))
          .agg(sum(col("c")).as("c"))
        import org.apache.spark.sql.expressions.Window
        val idx = daily.withColumn("t",
          (row_number().over(Window.partitionBy(col("event_type"))
            .orderBy(col("dy"))) - 1).cast("long"))
        idx.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("t") * col("c")).as("sty"),
            sum(col("t")).as("st"),
            sum(col("c")).as("sy"),
            sum(col("t") * col("t")).as("stt"),
            expr("aggregate(sort_array(collect_list(struct(dy, c))), CAST(0 AS BIGINT), (acc, x) -> (acc + x.c) div 2)")
              .as("ses_cents"))
          .selectExpr("event_type", "CAST(n AS BIGINT) AS n_days",
            "ses_cents",
            """CASE WHEN n * sty - st * sy >= 0
              |  THEN (n * sty - st * sy)
              |       div greatest(1L, (n * stt - st * st) div 1000000)
              |  ELSE -((st * sy - n * sty)
              |       div greatest(1L, (n * stt - st * st) div 1000000))
              |END AS slope_e6""".stripMargin)
          .selectExpr("event_type", "n_days", "ses_cents", "slope_e6",
            """CASE WHEN slope_e6 >= 0
              |  THEN ses_cents + slope_e6 div 2000000
              |  ELSE ses_cents - (-slope_e6) div 2000000
              |END AS f1_cents""".stripMargin,
            """CASE WHEN slope_e6 >= 0
              |  THEN ses_cents + (slope_e6 * 2) div 2000000
              |  ELSE ses_cents - ((-slope_e6) * 2) div 2000000
              |END AS f2_cents""".stripMargin,
            """CASE WHEN slope_e6 >= 0
              |  THEN ses_cents + (slope_e6 * 3) div 2000000
              |  ELSE ses_cents - ((-slope_e6) * 3) div 2000000
              |END AS f3_cents""".stripMargin)
      },
      Some("""WITH daily AS (
             |  SELECT event_type, epoch_us(ts) // 86400000000 AS dy,
             |         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
             |           AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |idx AS (SELECT event_type, dy, c,
             |          CAST(row_number() OVER (PARTITION BY event_type
             |            ORDER BY dy) - 1 AS BIGINT) AS t
             |        FROM daily),
             |a AS (SELECT event_type,
             |        CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(t * c) AS BIGINT) AS sty,
             |        CAST(sum(t) AS BIGINT) AS st,
             |        CAST(sum(c) AS BIGINT) AS sy,
             |        CAST(sum(t * t) AS BIGINT) AS stt,
             |        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             |               list(c ORDER BY dy)),
             |             (x, y) -> (x + y) // 2) AS BIGINT) AS ses_cents
             |      FROM idx GROUP BY 1),
             |b AS (SELECT event_type, n AS n_days, ses_cents,
             |        CASE WHEN n * sty - st * sy >= 0
             |          THEN (n * sty - st * sy)
             |               // greatest(1, (n * stt - st * st) // 1000000)
             |          ELSE -((st * sy - n * sty)
             |               // greatest(1, (n * stt - st * st) // 1000000))
             |        END AS slope_e6
             |      FROM a)
             |SELECT event_type, n_days, ses_cents, slope_e6,
             |       CASE WHEN slope_e6 >= 0
             |         THEN ses_cents + slope_e6 // 2000000
             |         ELSE ses_cents - (-slope_e6) // 2000000
             |       END AS f1_cents,
             |       CASE WHEN slope_e6 >= 0
             |         THEN ses_cents + (slope_e6 * 2) // 2000000
             |         ELSE ses_cents - ((-slope_e6) * 2) // 2000000
             |       END AS f2_cents,
             |       CASE WHEN slope_e6 >= 0
             |         THEN ses_cents + (slope_e6 * 3) // 2000000
             |         ELSE ses_cents - ((-slope_e6) * 3) // 2000000
             |       END AS f3_cents
             |FROM b""".stripMargin))
  )
}
