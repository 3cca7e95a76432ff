package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-175 batch — dynamic lot sizing as a distributed min-plus
  * shortest path, the POT half of extreme-value fitting, and the
  * quality-loss read:
  *
  *  - Wagner–Whitin (`q_lot_sizing`): optimal setup/holding schedule
  *    for monthly demand — the classic sequential DP re-expressed as a
  *    shortest path on the bounded month DAG: edge (i→j) = one setup
  *    at i covering i..j−1, cost K + h·Σ(t−i)d_t closed from TWO
  *    prefix sums (no per-edge scan). The DP recursion becomes
  *    SEVEN min-plus matrix squarings (2⁷=128 ≥ any month count this
  *    time axis can produce — the axis is calendar-bounded, NOT
  *    SF-bounded, so the unroll depth is a constant, the same reason
  *    q_viterbi_maxplus's ⌈log₂T⌉ works) — each squaring one keyed
  *    join + min aggregate on the T² edge frame. Identity self-loops
  *    make plain squaring monotone. Single-setup and setup-every-month
  *    policies ride along as bounds.
  *  - GPD fit (`q_gpd_fit`): method-of-moments generalized-Pareto
  *    ξ/β on order-value excesses over a data-derived 1.5×mean
  *    threshold — the peaks-over-threshold companion to
  *    q_block_maxima's Gumbel and q_hill_tail's tail index. Integer
  *    excess moments; two double closes.
  *  - Taguchi loss (`q_taguchi_loss`): per-brand expected quadratic
  *    loss around the quantity target 25, decomposed into bias² +
  *    variance (exact integers; the identity Σ(x−T)² = n(μ−T)² + Sxx
  *    is checked by construction since all three columns are emitted).
  */
object Round175Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Wagner–Whitin via 7 min-plus squarings on the month DAG.
    QueryDef("q_lot_sizing",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val K = 10000000L // setup: $100k in cents
        val monthly = Tables.lineitem(s, d)
          .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
            " div 2592000000000").as("mo"))
          .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("dq"))
        val idx = monthly
          .withColumn("t",
            (row_number().over(Window.orderBy("mo")) - 1).cast("long"))
          .withColumn("p1", sum(col("dq")).over(Window.orderBy("t")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("p2", sum(expr("t * dq")).over(Window.orderBy("t")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .localCheckpoint(false) // both prefix endpoints of every edge
        // prefix rows: P(j) = sums over t < j → shift by one; add j=0
        val pfx = idx.select((col("t") + 1).as("j"), col("p1"), col("p2"))
          .unionByName(s.range(1)
            .selectExpr("CAST(0 AS BIGINT) AS j", "CAST(0 AS BIGINT) AS p1",
              "CAST(0 AS BIGINT) AS p2"))
          .localCheckpoint(false)
        val edges = pfx.as("a").join(pfx.as("b"),
            col("b.j") > col("a.j"))
          .selectExpr("a.j AS i", "b.j AS j",
            s"$K + (b.p2 - a.p2) - a.j * (b.p1 - a.p1) AS c")
        val ident = pfx.selectExpr("j AS i", "j AS j",
          "CAST(0 AS BIGINT) AS c")
        var dk = edges.unionByName(ident).localCheckpoint(false)
        for (_ <- 1 to 7) {
          dk = dk.as("x").join(dk.as("y"), col("y.i") === col("x.j"))
            .selectExpr("x.i AS i", "y.j AS j", "x.c + y.c AS c")
            .groupBy(col("i"), col("j")).agg(min(col("c")).as("c"))
            .localCheckpoint(false)
        }
        val horizon = pfx.agg(max(col("j")).as("tt"))
        val best = dk.crossJoin(broadcast(horizon))
          .where(col("i") === 0L && col("j") === col("tt"))
          .selectExpr("j AS n_months", "c AS opt_cost_cents")
        val single = edges.crossJoin(broadcast(horizon))
          .where(col("i") === 0L && col("j") === col("tt"))
          .selectExpr("c AS single_setup_cents")
        val every = horizon.selectExpr(s"tt * $K AS monthly_setup_cents")
        best.crossJoin(broadcast(single)).crossJoin(broadcast(every))
      },
      Some {
        val K = 10000000L
        def sq(prev: String, cur: String) =
          s"""$cur AS MATERIALIZED (SELECT i, j, min(c) AS c FROM (
             |  SELECT x.i AS i, y.j AS j, x.c + y.c AS c
             |  FROM $prev x JOIN $prev y ON y.i = x.j
             |  UNION ALL SELECT i, j, c FROM $prev)
             |GROUP BY 1, 2)""".stripMargin
        s"""WITH monthly AS (
           |  SELECT epoch_us(l_shipdate) // 2592000000000 AS mo,
           |         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
           |           AS BIGINT) AS dq
           |  FROM lineitem GROUP BY 1),
           |idx AS (SELECT CAST(row_number() OVER (ORDER BY mo) - 1
           |          AS BIGINT) AS t, dq
           |        FROM monthly),
           |pfx0 AS (SELECT t + 1 AS j,
           |           CAST(sum(dq) OVER (ORDER BY t
           |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p1,
           |           CAST(sum(t * dq) OVER (ORDER BY t
           |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p2
           |         FROM idx),
           |pfx AS MATERIALIZED (SELECT * FROM pfx0
           |        UNION ALL SELECT 0, 0, 0),
           |edges AS MATERIALIZED (SELECT a.j AS i, b.j AS j,
           |            $K + (b.p2 - a.p2) - a.j * (b.p1 - a.p1) AS c
           |          FROM pfx a JOIN pfx b ON b.j > a.j),
           |d0 AS MATERIALIZED (SELECT * FROM edges
           |       UNION ALL SELECT j, j, 0 FROM pfx),
           |${sq("d0", "s1")},
           |${sq("s1", "s2")},
           |${sq("s2", "s3")},
           |${sq("s3", "s4")},
           |${sq("s4", "s5")},
           |${sq("s5", "s6")},
           |${sq("s6", "s7")},
           |hz AS (SELECT max(j) AS tt FROM pfx)
           |SELECT hz.tt AS n_months,
           |       (SELECT c FROM s7 CROSS JOIN hz
           |        WHERE i = 0 AND j = hz.tt) AS opt_cost_cents,
           |       (SELECT c FROM edges CROSS JOIN hz
           |        WHERE i = 0 AND j = hz.tt) AS single_setup_cents,
           |       hz.tt * $K AS monthly_setup_cents
           |FROM hz""".stripMargin
      }),

    // ── GPD MoM on excesses over a 1.5×mean threshold.
    QueryDef("q_gpd_fit",
      (s, d) => {
        val y = Tables.orders(s, d)
          .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("y"))
          .localCheckpoint(false) // threshold + excess moments
        val u = y.agg(expr("3 * (sum(y) div count(*)) div 2").as("u"))
        y.crossJoin(broadcast(u))
          .where(col("y") > col("u"))
          .selectExpr("y - u AS e", "u")
          .groupBy(col("u"))
          .agg(count(lit(1)).as("n"), sum(col("e")).as("se"),
            sum(expr("CAST(e AS decimal(38,0)) * e")).as("qe"))
          .selectExpr("u AS u_cents", "n AS n_exceed",
            "se div n AS mean_excess_cents",
            // m²/s² exactly: se² / (n·qe − se²)
            """CASE WHEN CAST(n AS decimal(38,0)) * qe
              |  - CAST(se AS decimal(38,0)) * se = 0 THEN NULL
              |ELSE round(CAST('0.5' AS DOUBLE) * (CAST('1.0' AS DOUBLE)
              | - CAST(CAST(se AS decimal(38,0)) * se AS DOUBLE)
              |   / CAST(CAST(n AS decimal(38,0)) * qe
              |     - CAST(se AS decimal(38,0)) * se AS DOUBLE)), 6)
              |END AS xi""".stripMargin,
            """CASE WHEN CAST(n AS decimal(38,0)) * qe
              |  - CAST(se AS decimal(38,0)) * se = 0 THEN NULL
              |ELSE round(CAST('0.5' AS DOUBLE) * CAST(se AS DOUBLE)
              | / CAST(n AS DOUBLE) * (CAST('1.0' AS DOUBLE)
              | + CAST(CAST(se AS decimal(38,0)) * se AS DOUBLE)
              |   / CAST(CAST(n AS decimal(38,0)) * qe
              |     - CAST(se AS decimal(38,0)) * se AS DOUBLE)), 6)
              |END AS beta_cents""".stripMargin)
      },
      Some("""WITH y AS (
             |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |           AS y
             |  FROM orders),
             |u AS (SELECT 3 * (CAST(sum(y) AS BIGINT)
             |        // CAST(count(*) AS BIGINT)) // 2 AS u FROM y),
             |ex AS (SELECT y - u AS e, u FROM y CROSS JOIN u
             |       WHERE y > u),
             |m AS (SELECT u, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(e) AS BIGINT) AS se,
             |             sum(CAST(e AS HUGEINT) * e) AS qe
             |      FROM ex GROUP BY 1)
             |SELECT u AS u_cents, n AS n_exceed,
             |       se // n AS mean_excess_cents,
             |       CASE WHEN CAST(n AS HUGEINT) * qe
             |           - CAST(se AS HUGEINT) * se = 0 THEN NULL
             |       ELSE round(CAST('0.5' AS DOUBLE) * (CAST('1.0' AS DOUBLE)
             |         - CAST(CAST(se AS HUGEINT) * se AS DOUBLE)
             |           / CAST(CAST(n AS HUGEINT) * qe
             |             - CAST(se AS HUGEINT) * se AS DOUBLE)), 6)
             |       END AS xi,
             |       CASE WHEN CAST(n AS HUGEINT) * qe
             |           - CAST(se AS HUGEINT) * se = 0 THEN NULL
             |       ELSE round(CAST('0.5' AS DOUBLE) * CAST(se AS DOUBLE)
             |         / CAST(n AS DOUBLE) * (CAST('1.0' AS DOUBLE)
             |         + CAST(CAST(se AS HUGEINT) * se AS DOUBLE)
             |           / CAST(CAST(n AS HUGEINT) * qe
             |             - CAST(se AS HUGEINT) * se AS DOUBLE)), 6)
             |       END AS beta_cents
             |FROM m""".stripMargin)),

    // ── Taguchi quadratic loss around quantity target 25, per brand.
    QueryDef("q_taguchi_loss",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          floor(col("l_quantity") + 0.5).cast("long").as("x"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(expr("(x - 25) * (x - 25)")).as("sq"))
        .selectExpr("p_brand", "n",
          "sx * 100 div n AS mean_q_e2",
          "sq * 100 div n AS loss_e2",
          // bias² term at e4: ((sx - 25n)/n)² ·1e4 exact via n²-scale
          "(sx - 25 * n) * (sx - 25 * n) * 10000 div (n * n)" +
            " AS bias_sq_e4"),
      Some("""SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
             |         AS BIGINT) * 100
             |         // CAST(count(*) AS BIGINT) AS mean_q_e2,
             |       CAST(sum((CAST(floor(l_quantity + 0.5) AS BIGINT)
             |           - 25) * (CAST(floor(l_quantity + 0.5) AS BIGINT)
             |           - 25)) AS BIGINT) * 100
             |         // CAST(count(*) AS BIGINT) AS loss_e2,
             |       (CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
             |           AS BIGINT) - 25 * CAST(count(*) AS BIGINT))
             |         * (CAST(sum(CAST(floor(l_quantity + 0.5)
             |             AS BIGINT)) AS BIGINT)
             |           - 25 * CAST(count(*) AS BIGINT)) * 10000
             |         // (CAST(count(*) AS BIGINT)
             |            * CAST(count(*) AS BIGINT)) AS bias_sq_e4
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |GROUP BY 1""".stripMargin))
  )
}
