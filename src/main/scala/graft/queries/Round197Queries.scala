package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-197 batch — supply-base risk from OBSERVED lineitem
  * supplier-part links (the testdata ships no partsupp table —
  * documented in Round125 too), nation-level sourcing overlap, and two
  * purchase-timing profiles:
  *
  *  - Sourcing coverage (`q_sourcing_coverage`): observed
  *    suppliers-per-part distribution — single-source share (the
  *    supply-chain risk headline), mean suppliers per part, and the
  *    mean unit-price spread (max−min) across each part's observed
  *    source set. Two grouped aggregates over lineitem; exact integer
  *    e6 (the unit price is floor(extprice·100/qty + 0.5), identical
  *    IEEE text both engines).
  *  - Supplier-nation overlap (`q_supplier_overlap`): pairwise Jaccard
  *    and containment of the part catalogs sourced from each supplier
  *    nation — where could sourcing shift in a disruption? Distinct
  *    (nation, part) frame self-joined on the part key (the supply-side
  *    twin of q_ngram_overlap's shape); nation-pair grid bounded at
  *    25².
  *  - Weekday effect (`q_weekday_effect`): day-of-week seasonal index
  *    of revenue — per-dow mean daily revenue over the all-days mean,
  *    with the dow day counts; calendar-bounded daily frame, exact
  *    integer e6 ratios.
  *  - Interarrival profile (`q_interarrival`): per-customer order gap
  *    days via a strictly-next-date argmin join (shuffle equi-join on
  *    o_custkey, ~orders²-per-customer fan-out, never global) — pooled
  *    mean gap, dispersion CV² = s²/x̄² (the Poisson-or-bursty
  *    readout), and the share of ≤7-day rapid repeats.
  *
  * Scale shapes: lineitem/orders grouped aggregates with broadcast
  * scalar totals; the overlap self-join shuffles on the part key with
  * distinct-level pre-aggregation; no windows. */
object Round197Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Observed suppliers-per-part coverage + unit-price spread.
    QueryDef("q_sourcing_coverage",
      (s, d) => {
        val links = Tables.lineitem(s, d)
          .where(col("l_quantity") >= 1.0)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(expr("CAST(floor(l_extendedprice * 100 / l_quantity" +
            " + 0.5) AS BIGINT)")).as("unit_cents"))
        val perPart = links.groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("ns"),
            (max(col("unit_cents")) - min(col("unit_cents")))
              .as("spread"))
        perPart.agg(count(lit(1)).as("n_parts"),
            sum(col("ns")).as("links"),
            sum(when(col("ns") === 1L, 1L).otherwise(0L))
              .as("single_src"),
            sum(col("spread")).as("spread_sum"))
          .selectExpr("n_parts", "links", "single_src",
            "single_src * 1000000 div n_parts AS single_share_e6",
            "links * 1000000 div n_parts AS suppliers_per_part_e6",
            "spread_sum div n_parts AS mean_spread_cents")
      },
      Some("""WITH links AS (
             |  SELECT l_partkey, l_suppkey,
             |         CAST(min(CAST(floor(l_extendedprice * 100
             |           / l_quantity + 0.5) AS BIGINT)) AS BIGINT)
             |           AS unit_cents
             |  FROM lineitem WHERE l_quantity >= 1.0 GROUP BY 1, 2),
             |pp AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS ns,
             |         CAST(max(unit_cents) - min(unit_cents) AS BIGINT)
             |           AS spread
             |       FROM links GROUP BY 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_parts,
             |       CAST(sum(ns) AS BIGINT) AS links,
             |       CAST(sum(CASE WHEN ns = 1 THEN 1 ELSE 0 END)
             |         AS BIGINT) AS single_src,
             |       CAST(sum(CASE WHEN ns = 1 THEN 1 ELSE 0 END)
             |         AS BIGINT) * 1000000 // count(*) AS single_share_e6,
             |       CAST(sum(ns) AS BIGINT) * 1000000 // count(*)
             |         AS suppliers_per_part_e6,
             |       CAST(sum(spread) AS BIGINT) // count(*)
             |         AS mean_spread_cents
             |FROM pp""".stripMargin)),

    // ── Pairwise part-catalog overlap between supplier nations.
    QueryDef("q_supplier_overlap",
      (s, d) => {
        val np = Tables.lineitem(s, d)
          .select(col("l_suppkey"), col("l_partkey"))
          .join(Tables.supplier(s, d)
            .select(col("s_suppkey").as("l_suppkey"),
              col("s_nationkey").as("nk")), Seq("l_suppkey"))
          .select(col("nk"), col("l_partkey").as("pk"))
          .distinct()
          .localCheckpoint(false) // distinct (nation, part)
        val sizes = np.groupBy(col("nk")).agg(count(lit(1)).as("n"))
        val inter = np.as("x").join(np.as("y"), Seq("pk"))
          .where(col("x.nk") < col("y.nk"))
          .groupBy(col("x.nk").as("n1k"), col("y.nk").as("n2k"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(broadcast(sizes.select(col("nk").as("n1k"),
            col("n").as("c1"))), Seq("n1k"))
          .join(broadcast(sizes.select(col("nk").as("n2k"),
            col("n").as("c2"))), Seq("n2k"))
          .selectExpr("n1k", "n2k", "inter", "c1", "c2",
            "inter * 1000000 div (c1 + c2 - inter) AS jaccard_e6",
            """CASE WHEN c1 <= c2 THEN inter * 1000000 div c1
              |ELSE inter * 1000000 div c2
              |END AS containment_e6""".stripMargin)
      },
      Some("""WITH np AS (
             |  SELECT DISTINCT s_nationkey AS nk, l_partkey AS pk
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
             |sizes AS (SELECT nk, CAST(count(*) AS BIGINT) AS n
             |          FROM np GROUP BY 1),
             |inter AS (SELECT x.nk AS n1k, y.nk AS n2k,
             |            CAST(count(*) AS BIGINT) AS inter
             |          FROM np x JOIN np y ON x.pk = y.pk
             |          WHERE x.nk < y.nk GROUP BY 1, 2)
             |SELECT n1k, n2k, inter, a.n AS c1, b.n AS c2,
             |       inter * 1000000 // (a.n + b.n - inter) AS jaccard_e6,
             |       CASE WHEN a.n <= b.n THEN inter * 1000000 // a.n
             |       ELSE inter * 1000000 // b.n
             |       END AS containment_e6
             |FROM inter JOIN sizes a ON a.nk = n1k
             |JOIN sizes b ON b.nk = n2k""".stripMargin)),

    // ── Day-of-week seasonal index of daily revenue.
    QueryDef("q_weekday_effect",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(col("o_orderdate").as("dt"))
          .agg(sum(expr("CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT)"))
            .as("x"))
          .localCheckpoint(false) // calendar-bounded
        // dow 0 = Monday via epoch-day arithmetic — Spark's dayofweek
        // (Sun=1) and DuckDB's (Sun=0) disagree, this does not.
        val dow = daily
          .groupBy(expr("CAST(datediff(dt, DATE'1970-01-05') % 7" +
            " AS BIGINT)").as("dow"))
          .agg(count(lit(1)).as("days"), sum(col("x")).as("rev"))
        val tot = daily.agg(count(lit(1)).as("nd"), sum(col("x")).as("rt"))
        dow.crossJoin(broadcast(tot))
          .selectExpr("dow", "days",
            "rev div days AS mean_rev_hecto",
            s"""CAST(CAST(rev AS $dec) * nd * 1000000
               |  div (CAST(rt AS $dec) * days) AS BIGINT)
               |  AS index_e6""".stripMargin)
      },
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS dt,
             |         CAST(sum(CAST(floor(o_totalprice / 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS x
             |  FROM orders GROUP BY 1),
             |dow AS (SELECT CAST(datediff('day', DATE '1970-01-05', dt)
             |            % 7 AS BIGINT) AS dow,
             |          CAST(count(*) AS BIGINT) AS days,
             |          CAST(sum(x) AS BIGINT) AS rev
             |        FROM daily GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
             |          CAST(sum(x) AS BIGINT) AS rt FROM daily)
             |SELECT dow, days, rev // days AS mean_rev_hecto,
             |       CAST(CAST(rev AS HUGEINT) * nd * 1000000
             |         // (CAST(rt AS HUGEINT) * days) AS BIGINT)
             |         AS index_e6
             |FROM dow CROSS JOIN tot""".stripMargin)),

    // ── Pooled order-interarrival profile (strictly-next-date gaps).
    QueryDef("q_interarrival",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey").as("ck"), col("o_orderdate").as("dt"))
        val gaps = o.as("a").join(o.as("b"),
            col("a.ck") === col("b.ck") && col("b.dt") > col("a.dt"))
          .groupBy(col("a.ck").as("ck"), col("a.dt").as("dt"))
          .agg(min(expr("datediff(b.dt, a.dt)")).as("g"))
        gaps.agg(count(lit(1)).as("n_gaps"),
            sum(col("g")).as("sg"),
            sum(col("g") * col("g")).as("sg2"),
            sum(when(col("g") <= 7L, 1L).otherwise(0L)).as("rapid"))
          .selectExpr("n_gaps",
            "sg * 1000000 div n_gaps AS mean_gap_days_e6",
            "rapid * 1000000 div n_gaps AS rapid_share_e6",
            s"""CASE WHEN n_gaps < 2 OR sg = 0 THEN NULL
               |ELSE CAST((CAST(n_gaps AS $dec) * sg2
               |    - CAST(sg AS $dec) * sg) * 1000000
               |  div (CAST(sg AS $dec) * sg) AS BIGINT)
               |END AS cv2_e6""".stripMargin)
      },
      Some("""WITH o AS (SELECT o_custkey AS ck,
             |             CAST(o_orderdate AS DATE) AS dt FROM orders),
             |gaps AS (SELECT a.ck, a.dt,
             |           CAST(min(datediff('day', a.dt, b.dt)) AS BIGINT)
             |             AS g
             |         FROM o a JOIN o b
             |           ON a.ck = b.ck AND b.dt > a.dt
             |         GROUP BY 1, 2),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_gaps,
             |         CAST(sum(g) AS BIGINT) AS sg,
             |         CAST(sum(g * g) AS BIGINT) AS sg2,
             |         CAST(sum(CASE WHEN g <= 7 THEN 1 ELSE 0 END)
             |           AS BIGINT) AS rapid
             |       FROM gaps)
             |SELECT n_gaps,
             |       sg * 1000000 // n_gaps AS mean_gap_days_e6,
             |       rapid * 1000000 // n_gaps AS rapid_share_e6,
             |       CASE WHEN n_gaps < 2 OR sg = 0 THEN NULL
             |       ELSE CAST((CAST(n_gaps AS HUGEINT) * sg2
             |           - CAST(sg AS HUGEINT) * sg) * 1000000
             |         // (CAST(sg AS HUGEINT) * sg) AS BIGINT)
             |       END AS cv2_e6
             |FROM ag""".stripMargin))
  )
}
