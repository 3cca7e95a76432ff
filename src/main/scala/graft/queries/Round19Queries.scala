package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Dedup, Stats}
import org.apache.spark.sql.functions._

/** Round-19 batch: decision-stump split finding, isotonic regression,
  * sorted-neighborhood ER blocking, asymmetric containment dedup, and
  * the TPC-H Q18 aggregate-then-join-back shape — each with an exact
  * DuckDB oracle twin.
  */
object Round19Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Decision stump: best variance-reduction split of quantity by
    //    discount percentage point. Exact integer gain on the distinct
    //    feature axis (11 thresholds), argmax ties toward the smaller.
    QueryDef("q_decision_stump",
      (s, d) => Stats.decisionStump(
        Tables.lineitem(s, d)
          .select(floor(col("l_quantity") + 0.5).cast("long").as("t"),
            floor(col("l_discount") * 100 + 0.5).cast("long").as("f")),
        "t", "f"),
      Some("""WITH b AS (
             |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS t,
             |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS f
             |  FROM lineitem),
             |cells AS (SELECT f, count(*) AS nv, sum(t) AS sv FROM b GROUP BY f),
             |cum AS (SELECT f,
             |          sum(nv) OVER (ORDER BY f ROWS BETWEEN UNBOUNDED
             |            PRECEDING AND CURRENT ROW) AS nl,
             |          sum(sv) OVER (ORDER BY f ROWS BETWEEN UNBOUNDED
             |            PRECEDING AND CURRENT ROW) AS sl,
             |          sum(nv) OVER () AS n, sum(sv) OVER () AS s
             |        FROM cells),
             |g AS (SELECT f, nl, n - nl AS nr, sl, s - sl AS sr FROM cum
             |      WHERE nl < n),
             |sc AS (SELECT f, nl, nr, sl, sr,
             |         CAST((sl * sl * nr + sr * sr * nl) * 1000000
             |              // (nl * nr) AS BIGINT) AS gain_e6
             |       FROM g)
             |SELECT f AS split_at, CAST(nl AS BIGINT) AS n_left,
             |       CAST(nr AS BIGINT) AS n_right, gain_e6,
             |       CAST(sl * 1000000 // nl AS BIGINT) AS mean_left_e6,
             |       CAST(sr * 1000000 // nr AS BIGINT) AS mean_right_e6
             |FROM sc ORDER BY gain_e6 DESC, f LIMIT 1""".stripMargin)),

    // ── Isotonic fit of the daily mean purchase value (cents) over the
    //    30-day axis: PAVA via the minimax identity, exact e6 integers.
    QueryDef("q_isotonic",
      (s, d) => Stats.isotonicFit(
        Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(expr("unix_micros(ts) div 86400000000L").as("b"),
            floor(col("value") * 100 + 0.5).cast("long").as("v")),
        "b", "v"),
      Some("""WITH src AS (
             |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS b,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             |  FROM events WHERE event_type = 'purchase'),
             |ax AS (SELECT b, count(*) AS nv, sum(v) AS sv FROM src GROUP BY b),
             |pre AS (SELECT b, nv, sv,
             |          sum(sv) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
             |            PRECEDING AND CURRENT ROW) AS ps,
             |          sum(nv) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
             |            PRECEDING AND CURRENT ROW) AS pn
             |        FROM ax),
             |grid AS (SELECT j.b AS jb, k.b AS kb,
             |           CAST((k.ps - (j.ps - j.sv)) * 1000000
             |                // (k.pn - (j.pn - j.nv)) AS BIGINT) AS m
             |         FROM pre j JOIN pre k ON j.b <= k.b),
             |sm AS (SELECT jb, kb,
             |         min(m) OVER (PARTITION BY jb ORDER BY kb DESC
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sm
             |       FROM grid),
             |ft AS (SELECT jb, kb,
             |         max(sm) OVER (PARTITION BY kb ORDER BY jb
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fit_e6
             |       FROM sm)
             |SELECT a.b AS bucket, CAST(a.nv AS BIGINT) AS n,
             |       CAST(a.sv * 1000000 // a.nv AS BIGINT) AS mean_e6, f.fit_e6
             |FROM ax a JOIN ft f ON f.kb = a.b AND f.jb = a.b""".stripMargin)),

    // ── Sorted-neighborhood blocking over (lang, n_chars): candidate
    //    pairs within rank distance 3, kept when token Jaccard ≥ 0.30.
    //    The engine's rank is distributed (range partitions + offsets);
    //    the oracle's is one window — same total order, same pairs.
    QueryDef("q_sorted_neighborhood",
      (s, d) => Dedup.sortedNeighborPairs(Tables.documents(s, d), 3, 300000L),
      Some("""WITH r AS (
             |  SELECT doc_id, row_number() OVER (
             |           ORDER BY lang, n_chars, doc_id) AS r
             |  FROM documents),
             |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |                b.r - a.r AS gap
             |         FROM r a JOIN r b ON b.r > a.r AND b.r <= a.r + 3),
             |w AS (SELECT DISTINCT doc_id, wd AS word
             |      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
             |            FROM documents) u WHERE wd <> ''),
             |sizes AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
             |inter AS (SELECT c.doc_a, c.doc_b, c.gap, count(*) AS i
             |          FROM cand c
             |          JOIN w wa ON wa.doc_id = c.doc_a
             |          JOIN w wb ON wb.doc_id = c.doc_b AND wb.word = wa.word
             |          GROUP BY 1, 2, 3)
             |SELECT i.doc_a, i.doc_b, CAST(i.gap AS BIGINT) AS gap,
             |       CAST(i.i * 1000000 // (sa.sz + sb.sz - i.i) AS BIGINT) AS jac_e6
             |FROM inter i
             |JOIN sizes sa ON sa.doc_id = i.doc_a
             |JOIN sizes sb ON sb.doc_id = i.doc_b
             |WHERE i.i * 1000000 >= 300000 * (sa.sz + sb.sz - i.i)""".stripMargin)),

    // ── Directed containment pairs at τ = 0.8 on a bounded slice: the
    //    engine goes through the lossless A-side prefix filter; the
    //    oracle brute-forces all pairs — equality proves losslessness.
    QueryDef("q_containment",
      (s, d) => Dedup.containmentPrefixJoin(
        Tables.documents(s, d).filter(col("doc_id") < 80)
          .select(col("doc_id"), col("text")),
        800000L),
      Some("""WITH w AS (SELECT DISTINCT doc_id, wd AS word
             |           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
             |                 FROM documents WHERE doc_id < 80) u
             |           WHERE wd <> ''),
             |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
             |          FROM w GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |                 CAST(count(*) AS BIGINT) AS inter
             |          FROM w a JOIN w b
             |            ON a.word = b.word AND a.doc_id <> b.doc_id
             |          GROUP BY 1, 2)
             |SELECT i.doc_a, i.doc_b, i.inter, sa.sz AS sza
             |FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
             |WHERE i.inter * 1000000 >= 800000 * sa.sz""".stripMargin)),

    // ── TPC-H Q18 shape: aggregate lineitem FIRST (map-side partial
    //    combine), filter to the tiny survivor set, then broadcast it
    //    back against orders — never orders⋈lineitem row-level.
    QueryDef("q_tpch_top_orders",
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("sum_qty"))
          .filter(col("sum_qty") >= 180L)
        Tables.orders(s, d)
          .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("total_cents"),
            col("sum_qty"))
          .orderBy(col("sum_qty").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""WITH big AS (
             |  SELECT l_orderkey,
             |         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
             |           AS sum_qty
             |  FROM lineitem GROUP BY l_orderkey
             |  HAVING sum_qty >= 180)
             |SELECT o.o_orderkey, o.o_custkey,
             |       CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
             |       b.sum_qty
             |FROM orders o JOIN big b ON b.l_orderkey = o.o_orderkey
             |ORDER BY b.sum_qty DESC, o.o_orderkey LIMIT 10""".stripMargin))
  )
}
