package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Classify, Graph, Stats, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-18 batch: Mann–Whitney rank test, two-feature OLS, a Naive
  * Bayes language classifier with its confusion matrix, strongly
  * connected components, and Fano-factor burstiness — each with an
  * exact DuckDB oracle twin.
  */
object Round18Queries {
  private val cents = "CAST(floor(value * 100 + 0.5) AS BIGINT)"

  def defs: Seq[QueryDef] = Seq(

    // ── Mann–Whitney U between click and purchase values: the
    //    nonparametric two-sample location test (pairs with q_ks_test's
    //    shape test). Doubled midranks keep ties integer-exact; the
    //    rank walk runs on the distinct-value axis.
    QueryDef("q_mann_whitney",
      (s, d) => Stats.mannWhitneyU(
        Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(when(col("event_type") === "click", 0L).otherwise(1L).as("s"),
            floor(col("value") * 100 + 0.5).cast("long").as("v")),
        "s", "v"),
      Some(s"""WITH p AS (
              |  SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS s,
              |         $cents AS v
              |  FROM events WHERE event_type IN ('click', 'purchase')),
              |cells AS (
              |  SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS c1,
              |         sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS c2
              |  FROM p GROUP BY v),
              |w AS (SELECT c1, c2,
              |        sum(c1 + c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
              |          PRECEDING AND CURRENT ROW) - (c1 + c2) AS bef
              |      FROM cells),
              |m AS (SELECT sum(c1) AS n1, sum(c2) AS n2,
              |             sum(c1 * (2 * bef + c1 + c2 + 1)) AS r2sum FROM w)
              |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
              |       CAST(r2sum - n1 * (n1 + 1) AS BIGINT) AS u2_a,
              |       CAST(2 * n1 * n2 - (r2sum - n1 * (n1 + 1)) AS BIGINT) AS u2_b
              |FROM m""".stripMargin)),

    // ── OLS: extended price ~ quantity + discount(pp) over lineitem.
    //    Exact DECIMAL(38,0) centered moments, Cramer solve, three
    //    deterministic double divisions.
    QueryDef("q_linreg2",
      (s, d) => Stats.linearRegression2(
        Tables.lineitem(s, d)
          .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"),
            floor(col("l_quantity") + 0.5).cast("long").as("x1"),
            floor(col("l_discount") * 100 + 0.5).cast("long").as("x2")),
        "y", "x1", "x2"),
      Some("""WITH b AS (
             |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
             |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS x1,
             |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2
             |  FROM lineitem),
             |m AS (SELECT count(*) AS n, sum(y) AS sy, sum(x1) AS s1,
             |             sum(x2) AS s2, sum(x1 * x1) AS q11,
             |             sum(x2 * x2) AS q22, sum(x1 * x2) AS q12,
             |             sum(x1 * y) AS p1, sum(x2 * y) AS p2 FROM b),
             |c AS (SELECT CAST(n AS BIGINT) AS n, sy, s1, s2,
             |        n * q11 - s1 * s1 AS c11, n * q22 - s2 * s2 AS c22,
             |        n * q12 - s1 * s2 AS c12,
             |        n * p1 - s1 * sy AS cy1, n * p2 - s2 * sy AS cy2 FROM m),
             |d AS (SELECT n, sy, s1, s2,
             |        c11 * c22 - c12 * c12 AS det,
             |        cy1 * c22 - cy2 * c12 AS nb1,
             |        cy2 * c11 - cy1 * c12 AS nb2 FROM c),
             |e AS (SELECT n, det, sy, s1, s2,
             |        CASE WHEN det = 0 THEN NULL
             |             ELSE round(CAST(nb1 AS DOUBLE) / CAST(det AS DOUBLE), 6)
             |        END AS b1,
             |        CASE WHEN det = 0 THEN NULL
             |             ELSE round(CAST(nb2 AS DOUBLE) / CAST(det AS DOUBLE), 6)
             |        END AS b2 FROM d)
             |SELECT n, b1, b2,
             |       CASE WHEN det = 0 THEN NULL
             |            ELSE round((CAST(sy AS DOUBLE) - b1 * CAST(s1 AS DOUBLE)
             |                 - b2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE), 6)
             |       END AS b0
             |FROM e""".stripMargin)),

    // ── Naive Bayes language identification, trained on folds 1-4 and
    //    scored on fold 0, reported as a confusion matrix — exact e6
    //    fixed-point log₂ scores, so the argmax is bit-deterministic.
    QueryDef("q_naive_bayes",
      (s, d) => Classify.naiveBayesConfusion(
        Tables.documents(s, d), "doc_id", "lang", "text", 0L),
      Some(Round18Queries.nbConfusionSql))) ++ defsTail

  /** Oracle twin of Classify.naiveBayesConfusion over `documents` —
    * shared with q_confusion_metrics (Round43). */
  private[queries] def nbConfusionSql: String = {
    val lgCnt = Bm25.log2E6Sql("(coalesce(mo.cnt, 0) + 1)")
    val lgNc = Bm25.log2E6Sql("n_c")
    // CAST: tot_c is a DuckDB sum() → HUGEINT, and a HUGEINT index
    // breaks the helper's mantissa-table subscript.
    val lgDen = Bm25.log2E6Sql("CAST(tot_c + v AS BIGINT)")
    s"""WITH tok AS (
           |  SELECT doc_id AS id, lang AS label, doc_id % 5 AS fold, wd AS tok
           |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS wd
           |        FROM documents) u WHERE wd <> ''),
           |model AS MATERIALIZED (
           |  SELECT tok, label AS c, count(*) AS cnt
           |  FROM tok WHERE fold <> 0 GROUP BY 1, 2),
           |ctot AS (SELECT c, sum(cnt) AS tot_c FROM model GROUP BY 1),
           |prior AS (SELECT lang AS c, count(*) AS n_c FROM documents
           |          WHERE doc_id % 5 <> 0 GROUP BY 1),
           |vocab AS (SELECT count(DISTINCT tok) AS v FROM model),
           |classes AS MATERIALIZED (
           |  SELECT c, $lgNc AS prior_e6, $lgDen AS denom_e6
           |  FROM ctot JOIN prior USING (c), vocab),
           |ttok AS (SELECT id, label, tok, count(*) AS m
           |         FROM tok WHERE fold = 0 GROUP BY 1, 2, 3),
           |grid AS (SELECT t.id, t.label, t.tok, t.m, cl.c
           |         FROM ttok t CROSS JOIN (SELECT c FROM classes) cl),
           |sc AS (SELECT g.id, g.label, g.c,
           |         sum(g.m * $lgCnt) AS num_e6, sum(g.m) AS len
           |       FROM grid g LEFT JOIN model mo
           |         ON mo.tok = g.tok AND mo.c = g.c
           |       GROUP BY 1, 2, 3),
           |fin AS (SELECT sc.id, sc.label, sc.c,
           |          cl.prior_e6 + sc.num_e6 - sc.len * cl.denom_e6 AS score
           |        FROM sc JOIN classes cl ON cl.c = sc.c),
           |pr AS (SELECT id, label, c AS pred,
           |         row_number() OVER (PARTITION BY id
           |                            ORDER BY score DESC, c) AS rn
           |       FROM fin)
           |SELECT label, pred, count(*) AS n_docs
           |FROM pr WHERE rn = 1 GROUP BY 1, 2""".stripMargin
  }

  def defsTail: Seq[QueryDef] = Seq(

    // ── Strongly connected components of the functional graph
    //    id → (7·id + 3) mod 100: cycle nodes share a component, tree
    //    tails are singletons. Pointer-doubling closure (log rounds).
    QueryDef("q_scc",
      (s, d) => {
        val nodes = Tables.part(s, d)
          .select((col("p_partkey") % 100).as("id")).distinct()
        val edges = nodes.select(col("id").as("src"),
          ((col("id") * 7 + 3) % 100).as("dst"))
        Graph.sccMinLabel(nodes, edges, 8)
      },
      Some("""WITH RECURSIVE
             |nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
             |e AS (SELECT id AS u, (id * 7 + 3) % 100 AS v FROM nodes),
             |reach(u, v) AS (
             |  SELECT u, v FROM e
             |  UNION
             |  SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.v),
             |r2 AS (SELECT u, v FROM reach UNION SELECT id, id FROM nodes)
             |SELECT CAST(a.u AS BIGINT) AS id, CAST(min(a.v) AS BIGINT) AS scc_id
             |FROM r2 a JOIN r2 b ON b.u = a.v AND b.v = a.u
             |GROUP BY 1""".stripMargin)),

    // ── Burstiness: Fano factor (variance/mean) of daily event counts
    //    per type — all integer, one truncating division.
    QueryDef("q_burstiness",
      (s, d) => TimeSeries.fanoFactor(
        Tables.events(s, d)
          .withColumn("day", expr("unix_micros(ts) div 86400000000L")),
        "event_type", "day"),
      Some("""WITH c AS (
             |  SELECT event_type AS key,
             |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             |         count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT key, count(*) AS n, sum(c) AS s, sum(c * c) AS q
             |      FROM c GROUP BY key)
             |SELECT key, CAST(n AS BIGINT) AS n_buckets,
             |       CAST((n * q - s * s) * 1000000 // (n * s) AS BIGINT) AS fano_e6
             |FROM m""".stripMargin))
  )
}
