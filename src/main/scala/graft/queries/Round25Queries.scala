package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Behavior, Recsys, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-25 batch: Shapley-value attribution, multi-lag ACF, and
  * recall@5 evaluation of the basket recommender — each with an exact
  * DuckDB oracle twin.
  */
object Round25Queries {

  private val chs = Seq("view", "click", "signup", "error")

  def defs: Seq[QueryDef] = Seq(

    // ── Shapley attribution over the 4-channel coalition lattice:
    //    v(S) = observed conversion rate of the exact touch set,
    //    factorial weights as popcount constants, sign-factored / 4!.
    QueryDef("q_shapley_attribution",
      (s, d) => Behavior.shapleyAttribution(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "user_id", "t_us", "event_id", "event_type", "purchase", chs),
      Some {
        val bitCase = chs.zipWithIndex.map { case (c, i) =>
          s"WHEN et = '$c' THEN ${1L << i}"
        }.mkString(" ")
        val pop = (0 until 4).map(i => s"((s >> $i) & 1)").mkString(" + ")
        def fact(x: Int): Long = (1 to x).foldLeft(1L)(_ * _)
        val wCase = (0 until 4).map(k =>
          s"WHEN $pop = $k THEN ${fact(k) * fact(3 - k)}").mkString(" ")
        s"""WITH ev AS MATERIALIZED (
           |  SELECT user_id AS u, epoch_us(ts) AS t, event_id AS tie,
           |         event_type AS et
           |  FROM events
           |  WHERE event_type IN ('purchase', ${chs.map(c => s"'$c'").mkString(", ")})),
           |cp AS (SELECT u, t AS ct, tie AS ctie FROM (
           |         SELECT u, t, tie, row_number() OVER
           |           (PARTITION BY u ORDER BY t, tie) AS rn
           |         FROM ev WHERE et = 'purchase') WHERE rn = 1),
           |touches AS MATERIALIZED (
           |  SELECT e.u, CASE $bitCase ELSE 0 END AS b
           |  FROM ev e LEFT JOIN cp ON cp.u = e.u
           |  WHERE e.et <> 'purchase'
           |    AND (cp.u IS NULL OR e.t < cp.ct
           |         OR (e.t = cp.ct AND e.tie < cp.ctie))),
           |masks AS (SELECT u, bit_or(b) AS mask FROM touches GROUP BY u
           |          UNION ALL
           |          SELECT u, 0 AS mask FROM cp
           |          WHERE u NOT IN (SELECT DISTINCT u FROM touches)),
           |users AS (SELECT m.mask,
           |            CASE WHEN cp.u IS NULL THEN 0 ELSE 1 END AS cv
           |          FROM masks m LEFT JOIN cp ON cp.u = m.u),
           |vtab AS MATERIALIZED (
           |  SELECT mask, CAST(sum(cv) * 1000000 // count(*) AS BIGINT) AS v_e6
           |  FROM users GROUP BY mask),
           |lattice AS (
           |  SELECT g.s, c.channel, c.cbit
           |  FROM (SELECT unnest(generate_series(0, 15)) AS s) g
           |  CROSS JOIN (VALUES ${chs.zipWithIndex.map { case (c, i) =>
          s"('$c', ${1L << i})"
        }.mkString(", ")}) c(channel, cbit)
           |  WHERE (g.s & c.cbit) = 0),
           |terms AS (
           |  SELECT l.channel,
           |         (CASE $wCase END) *
           |         (coalesce(v1.v_e6, 0) - coalesce(v0.v_e6, 0)) AS term
           |  FROM lattice l
           |  LEFT JOIN vtab v0 ON v0.mask = l.s
           |  LEFT JOIN vtab v1 ON v1.mask = (l.s | l.cbit)),
           |agg AS (SELECT channel, sum(term) AS num FROM terms GROUP BY channel)
           |SELECT channel,
           |       CAST(CASE WHEN num < 0 THEN -((-num) // 24)
           |                 ELSE num // 24 END AS BIGINT) AS phi_e6
           |FROM agg""".stripMargin
      }),

    // ── Full ACF (lags 1..7) of daily event counts per type, classic
    //    global-mean estimator, exact decimal moments.
    QueryDef("q_acf",
      (s, d) => TimeSeries.acf(
        Tables.events(s, d)
          .withColumn("day", expr("unix_micros(ts) div 86400000000L")),
        "event_type", "day", 7),
      Some("""WITH ax AS (
             |  SELECT event_type AS key,
             |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             |         CAST(count(*) AS HUGEINT) AS x
             |  FROM events GROUP BY 1, 2),
             |tot AS (SELECT key, CAST(count(*) AS HUGEINT) AS n,
             |               CAST(sum(x) AS HUGEINT) AS s
             |        FROM ax GROUP BY key),
             |cen AS (SELECT a.key, a.day, a.n * a.x - a.s AS c
             |        FROM (SELECT ax.*, t.n, t.s FROM ax JOIN tot t
             |              ON t.key = ax.key) a),
             |den AS (SELECT key, sum(c * c) AS den FROM cen GROUP BY key),
             |pr AS (SELECT a.key, l.lag, a.c, b.c AS cl
             |       FROM cen a
             |       CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS lag) l
             |       JOIN cen b ON b.key = a.key AND b.day = a.day + l.lag),
             |num AS (SELECT key, lag, CAST(count(*) AS BIGINT) AS n_pairs,
             |               sum(c * cl) AS num
             |        FROM pr GROUP BY key, lag)
             |SELECT n.key, CAST(n.lag AS BIGINT) AS lag, n.n_pairs,
             |       CASE WHEN d.den = 0 THEN NULL
             |            ELSE round(CAST(n.num AS DOUBLE) /
             |                 CAST(d.den AS DOUBLE), 6)
             |       END AS r
             |FROM num n JOIN den d ON d.key = n.key""".stripMargin)),

    // ── Recall@5 of the basket recommender: train on pre-1999 orders,
    //    evaluate on the rest — the leave-forward CF evaluation.
    QueryDef("q_cf_recall",
      (s, d) => {
        // one orders⋈lineitem pass feeds BOTH the train and test branches
        val li = Tables.lineitem(s, d).join(
          Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_partkey"), col("o_orderdate"))
          .localCheckpoint(false)
        val train = li.filter(expr("o_orderdate < TIMESTAMP_NTZ'1999-01-01'"))
          .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
        val test = li.filter(expr("o_orderdate >= TIMESTAMP_NTZ'1999-01-01'"))
          .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
        Recsys.recallAtK(train, test, "b", "i", 2L, 5)
      },
      Some("""WITH li AS MATERIALIZED (
             |  SELECT l.l_orderkey AS b, l.l_partkey AS i, o.o_orderdate AS dt
             |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
             |bi AS MATERIALIZED (
             |  SELECT DISTINCT b, i FROM li WHERE dt < TIMESTAMP '1999-01-01'),
             |itot AS (SELECT i, count(*) AS ci FROM bi GROUP BY i),
             |co AS (SELECT x.i AS item, y.i AS rec, count(*) AS n_co
             |       FROM bi x JOIN bi y ON x.b = y.b AND x.i <> y.i
             |       GROUP BY 1, 2 HAVING count(*) >= 2),
             |sc AS (SELECT item, rec,
             |         CAST(n_co * n_co * 1000000000000 // (a.ci * b.ci)
             |              AS BIGINT) AS cos2_e12
             |       FROM co JOIN itot a ON a.i = co.item
             |               JOIN itot b ON b.i = co.rec),
             |recs AS MATERIALIZED (
             |  SELECT item, rec FROM (
             |    SELECT item, rec, row_number() OVER
             |      (PARTITION BY item ORDER BY cos2_e12 DESC, rec) AS rk
             |    FROM sc) WHERE rk <= 5),
             |ti AS MATERIALIZED (
             |  SELECT DISTINCT b, i FROM li WHERE dt >= TIMESTAMP '1999-01-01'),
             |pairs AS (SELECT x.b, x.i AS item, y.i AS rec
             |          FROM ti x JOIN ti y ON x.b = y.b AND x.i <> y.i),
             |ev AS (SELECT DISTINCT b, item FROM pairs),
             |hits AS (SELECT DISTINCT p.b, p.item FROM pairs p
             |         JOIN recs r ON r.item = p.item AND r.rec = p.rec)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM ev) AS n_eval,
             |       (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hits,
             |       CAST((SELECT CAST(count(*) AS BIGINT) FROM hits) * 1000000
             |            // (SELECT CAST(count(*) AS BIGINT) FROM ev)
             |            AS BIGINT) AS recall_e6""".stripMargin))
  )
}
