package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.functions._

/** Round-189 batch — distribution divergence, ordinal association on
  * rectangular tables, an entropy spectrum, and paired-table symmetry:
  *
  *  - Jensen–Shannon divergence (`q_js_divergence`): the SYMMETRIC,
  *    bounded KL companion to q_kl_vocab — returned-vs-kept lineitems
  *    compared over quantity deciles. The per-cell log ratio
  *    (p_i/P)/m_i = 2·p_i·Q/(p_i·Q+q_i·P) is a BIGINT ratio, so both
  *    one-sided KL(·‖M) legs and the JSD ride the shared integer log₂;
  *    the weighted close clears e6 through decimal headroom.
  *  - Stuart's τ-c (`q_tau_c`): the RECTANGULAR-table cousin of
  *    q_gamma_kruskal (γ ignores ties entirely; τ-c renormalizes by
  *    min(rows,cols) so a 6×6 table can reach ±1). Same bounded ≤36²
  *    cell self-join for C and D; m from two tiny count-distincts.
  *  - Rényi spectrum (`q_renyi_entropy`): Hartley H₀, Shannon H₁,
  *    collision H₂ and min-entropy H∞ of the part-popularity
  *    distribution in one pass — H₂ = log₂(n²/Σc²) and H∞ =
  *    log₂(n/max c) are pure BIGINT log₂ identities, H₁ via
  *    n·H₁ = n·log₂ n − Σ c·log₂ c. The four-point spectrum is the
  *    monotone sanity check H₀ ≥ H₁ ≥ H₂ ≥ H∞ downstream gates use.
  *  - Bowker symmetry (`q_bowker`): is the LAST line of an order drawn
  *    from the same quantity band as the FIRST? χ² = Σ_{i<j}
  *    (n_ij−n_ji)²/(n_ij+n_ji) over the 6×6 first→last decile table —
  *    the multi-category McNemar (q_mcnemar is the 2×2 special case).
  *    Per-pair terms are exact integer e6 divisions.
  *
  * Scale shapes: cells frames are ≤36 rows (one exchange each); the
  * Bowker first/last extraction is two shuffle equi-joins on
  * l_orderkey (co-partitioned, no broadcast needed at any SF); no
  * windows, no driver materialization beyond the documented
  * localCheckpoint of ≤36-row frames. */
object Round189Queries {

  private val dec = "decimal(38,0)"

  /** quantity-decile × discount-band cells (≤ 36 at any SF) — the
    * Round188 γ table, re-stated for τ-c. */
  private val qdCellsSql =
    """WITH cells AS (
      |  SELECT least(CAST(floor(l_quantity + 0.5) AS BIGINT) // 10, 5)
      |           AS i,
      |         least(CAST(floor(l_discount * 100 + 0.5) AS BIGINT) // 2,
      |           5) AS j,
      |         CAST(count(*) AS BIGINT) AS o
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  private def qdCells(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .select(expr("least(CAST(floor(l_quantity + 0.5) AS BIGINT)" +
        " div 10, 5)").as("i"),
        expr("least(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)" +
          " div 2, 5)").as("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("o"))
      .localCheckpoint(false) // ≤ 36 cells, self-joined

  /** returned-vs-kept counts per quantity decile (≤ 6 cells). */
  private val rfCellsSql =
    """WITH cells AS (
      |  SELECT least(CAST(floor(l_quantity + 0.5) AS BIGINT) // 10, 5)
      |           AS i,
      |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |           AS BIGINT) AS p,
      |         CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
      |           AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── Jensen–Shannon divergence, returned vs kept quantity shape.
    QueryDef("q_js_divergence",
      (s, d) => {
        val cells = Tables.lineitem(s, d)
          .select(expr("least(CAST(floor(l_quantity + 0.5) AS BIGINT)" +
            " div 10, 5)").as("i"), col("l_returnflag").as("rf"))
          .groupBy(col("i"))
          .agg(sum(when(col("rf") === "R", 1L).otherwise(0L)).as("p"),
            sum(when(col("rf") =!= "R", 1L).otherwise(0L)).as("q"))
          .localCheckpoint(false) // ≤ 6 cells
        val tot = cells.agg(sum(col("p")).as("pt"), sum(col("q")).as("qt"))
        val terms = cells.crossJoin(broadcast(tot))
          .withColumn("den", expr("p * qt + q * pt"))
          .withColumn("t1", when(col("p") === 0L, 0L).otherwise(
            col("p") * (Bm25.log2E6(expr("2 * p * qt")) -
              Bm25.log2E6(col("den")))))
          .withColumn("t2", when(col("q") === 0L, 0L).otherwise(
            col("q") * (Bm25.log2E6(expr("2 * q * pt")) -
              Bm25.log2E6(col("den")))))
        terms.agg(max(col("pt")).as("pt"), max(col("qt")).as("qt"),
            sum(col("t1")).as("s1"), sum(col("t2")).as("s2"))
          .selectExpr("pt", "qt",
            s"""CASE WHEN pt = 0 OR s1 IS NULL THEN NULL
               |WHEN s1 >= 0 THEN s1 div pt
               |ELSE -((-s1) div pt) END AS kl_pm_e6""".stripMargin,
            s"""CASE WHEN qt = 0 OR s2 IS NULL THEN NULL
               |WHEN s2 >= 0 THEN s2 div qt
               |ELSE -((-s2) div qt) END AS kl_qm_e6""".stripMargin,
            s"""CASE WHEN pt = 0 OR qt = 0 THEN NULL
               |WHEN CAST(qt AS $dec) * s1 + CAST(pt AS $dec) * s2 >= 0
               |THEN CAST((CAST(qt AS $dec) * s1 + CAST(pt AS $dec) * s2)
               |  div (CAST(pt AS $dec) * qt * 2) AS BIGINT)
               |ELSE -CAST((-(CAST(qt AS $dec) * s1
               |    + CAST(pt AS $dec) * s2))
               |  div (CAST(pt AS $dec) * qt * 2) AS BIGINT)
               |END AS jsd_e6""".stripMargin)
      },
      Some {
        def L(v: String) = s"CAST(${Bm25.log2E6Sql(v)} AS BIGINT)"
        rfCellsSql +
          s""",
             |tot AS (SELECT CAST(sum(p) AS BIGINT) AS pt,
             |          CAST(sum(q) AS BIGINT) AS qt FROM cells),
             |terms AS (SELECT pt, qt,
             |    CASE WHEN p = 0 THEN 0
             |    ELSE p * (${L("2 * p * qt")} - ${L("p * qt + q * pt")})
             |    END AS t1,
             |    CASE WHEN q = 0 THEN 0
             |    ELSE q * (${L("2 * q * pt")} - ${L("p * qt + q * pt")})
             |    END AS t2
             |  FROM cells CROSS JOIN tot),
             |sa AS (SELECT max(pt) AS pt, max(qt) AS qt,
             |         CAST(sum(t1) AS BIGINT) AS s1,
             |         CAST(sum(t2) AS BIGINT) AS s2
             |       FROM terms)
             |SELECT pt, qt,
             |  CASE WHEN pt = 0 OR s1 IS NULL THEN NULL
             |  WHEN s1 >= 0 THEN s1 // pt
             |  ELSE -((-s1) // pt) END AS kl_pm_e6,
             |  CASE WHEN qt = 0 OR s2 IS NULL THEN NULL
             |  WHEN s2 >= 0 THEN s2 // qt
             |  ELSE -((-s2) // qt) END AS kl_qm_e6,
             |  CASE WHEN pt = 0 OR qt = 0 THEN NULL
             |  WHEN CAST(qt AS HUGEINT) * s1 + CAST(pt AS HUGEINT) * s2
             |    >= 0
             |  THEN CAST((CAST(qt AS HUGEINT) * s1
             |      + CAST(pt AS HUGEINT) * s2)
             |    // (CAST(pt AS HUGEINT) * qt * 2) AS BIGINT)
             |  ELSE -CAST((-(CAST(qt AS HUGEINT) * s1
             |      + CAST(pt AS HUGEINT) * s2))
             |    // (CAST(pt AS HUGEINT) * qt * 2) AS BIGINT)
             |  END AS jsd_e6
             |FROM sa""".stripMargin
      }),

    // ── Stuart's tau-c on the quantity×discount cell table.
    QueryDef("q_tau_c",
      (s, d) => {
        val cells = qdCells(s, d)
        val dims = cells.agg(countDistinct(col("i")).as("r"),
          countDistinct(col("j")).as("k"), sum(col("o")).as("n"))
        val p = cells.as("a").join(broadcast(cells.as("b")),
          col("a.i") =!= col("b.i") && col("a.j") =!= col("b.j"))
        p.agg(
            sum(when((col("b.i") > col("a.i")) === (col("b.j") > col("a.j")),
              col("a.o") * col("b.o")).otherwise(0L)).as("c2"),
            sum(when((col("b.i") > col("a.i")) =!= (col("b.j") > col("a.j")),
              col("a.o") * col("b.o")).otherwise(0L)).as("d2"))
          .crossJoin(broadcast(dims))
          .withColumn("m", expr("least(r, k)"))
          .selectExpr("c2 div 2 AS conc", "d2 div 2 AS disc", "m",
            s"""CASE WHEN n = 0 OR m < 2 THEN NULL
               |WHEN c2 >= d2 THEN CAST(CAST(m * (c2 - d2) AS $dec)
               |  * 1000000 div (CAST(n AS $dec) * n * (m - 1)) AS BIGINT)
               |ELSE -CAST(CAST(m * (d2 - c2) AS $dec) * 1000000
               |  div (CAST(n AS $dec) * n * (m - 1)) AS BIGINT)
               |END AS tau_c_e6""".stripMargin)
      },
      Some(qdCellsSql +
        """,
          |dims AS (SELECT CAST(count(DISTINCT i) AS BIGINT) AS r,
          |           CAST(count(DISTINCT j) AS BIGINT) AS k,
          |           CAST(sum(o) AS BIGINT) AS n FROM cells),
          |p AS (SELECT
          |  CAST(sum(CASE WHEN (b.i > a.i) = (b.j > a.j)
          |    THEN a.o * b.o ELSE 0 END) AS BIGINT) AS c2,
          |  CAST(sum(CASE WHEN (b.i > a.i) <> (b.j > a.j)
          |    THEN a.o * b.o ELSE 0 END) AS BIGINT) AS d2
          |FROM cells a JOIN cells b ON a.i <> b.i AND a.j <> b.j),
          |j AS (SELECT c2, d2, least(r, k) AS m, n
          |      FROM p CROSS JOIN dims)
          |SELECT c2 // 2 AS conc, d2 // 2 AS disc, m,
          |       CASE WHEN n = 0 OR m < 2 THEN NULL
          |       WHEN c2 >= d2 THEN CAST(CAST(m * (c2 - d2) AS HUGEINT)
          |         * 1000000 // (CAST(n AS HUGEINT) * n * (m - 1))
          |         AS BIGINT)
          |       ELSE -CAST(CAST(m * (d2 - c2) AS HUGEINT) * 1000000
          |         // (CAST(n AS HUGEINT) * n * (m - 1)) AS BIGINT)
          |       END AS tau_c_e6
          |FROM j""".stripMargin)),

    // ── Rényi spectrum H0 ≥ H1 ≥ H2 ≥ Hmin of part popularity.
    QueryDef("q_renyi_entropy",
      (s, d) => {
        val freq = Tables.lineitem(s, d)
          .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
        freq.agg(count(lit(1)).as("dk"), sum(col("c")).as("n"),
            sum(col("c") * col("c")).as("c2"),
            max(col("c")).as("cm"),
            sum(col("c") * Bm25.log2E6(col("c"))).as("slc"))
          .withColumn("h0_e6", Bm25.log2E6(col("dk")))
          .withColumn("h1_e6",
            Bm25.log2E6(col("n")) - expr("slc div n"))
          .withColumn("h2_e6",
            Bm25.log2E6(expr("n * n")) - Bm25.log2E6(col("c2")))
          .withColumn("hmin_e6",
            Bm25.log2E6(col("n")) - Bm25.log2E6(col("cm")))
          .select(col("n"), col("dk"), col("h0_e6"), col("h1_e6"),
            col("h2_e6"), col("hmin_e6"))
      },
      Some {
        def L(v: String) = s"CAST(${Bm25.log2E6Sql(v)} AS BIGINT)"
        s"""WITH freq AS (
           |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
           |  FROM lineitem GROUP BY 1),
           |agg AS (SELECT CAST(count(*) AS BIGINT) AS dk,
           |          CAST(sum(c) AS BIGINT) AS n,
           |          CAST(sum(c * c) AS BIGINT) AS c2,
           |          CAST(max(c) AS BIGINT) AS cm,
           |          CAST(sum(c * ${L("c")}) AS BIGINT) AS slc
           |        FROM freq)
           |SELECT n, dk,
           |       ${L("dk")} AS h0_e6,
           |       ${L("n")} - slc // n AS h1_e6,
           |       ${L("n * n")} - ${L("c2")} AS h2_e6,
           |       ${L("n")} - ${L("cm")} AS hmin_e6
           |FROM agg""".stripMargin
      }),

    // ── Bowker symmetry: first-vs-last line quantity band per order.
    QueryDef("q_bowker",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
            expr("least(CAST(floor(l_quantity + 0.5) AS BIGINT)" +
              " div 10, 5)").as("g"))
        val ends = li.groupBy(col("ok"))
          .agg(min(col("ln")).as("a"), max(col("ln")).as("b"))
        val fi = ends.join(li.select(col("ok"), col("ln"),
            col("g").as("i")),
          Seq("ok")).where(col("ln") === col("a")).select(col("ok"),
          col("i"))
        val la = ends.join(li.select(col("ok"), col("ln"),
            col("g").as("j")),
          Seq("ok")).where(col("ln") === col("b")).select(col("ok"),
          col("j"))
        val pairs = fi.join(la, Seq("ok"))
          .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
        val canon = pairs.where(col("i") =!= col("j"))
          .groupBy(least(col("i"), col("j")).as("lo"),
            greatest(col("i"), col("j")).as("hi"))
          .agg(sum(when(col("i") < col("j"), col("c")).otherwise(0L))
            .as("nij"),
            sum(when(col("i") > col("j"), col("c")).otherwise(0L))
              .as("nji"))
        canon.where(col("nij") + col("nji") > 0L)
          .agg(count(lit(1)).as("df"),
            sum(expr("(nij - nji) * (nij - nji) * 1000000" +
              " div (nij + nji)")).as("chi2_e6"))
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey AS ok, l_linenumber AS ln,
             |    least(CAST(floor(l_quantity + 0.5) AS BIGINT) // 10, 5)
             |      AS g
             |  FROM lineitem),
             |ends AS (SELECT ok, min(ln) AS a, max(ln) AS b
             |         FROM li GROUP BY 1),
             |fi AS (SELECT li.ok, li.g AS i FROM ends
             |       JOIN li ON li.ok = ends.ok AND li.ln = ends.a),
             |la AS (SELECT li.ok, li.g AS j FROM ends
             |       JOIN li ON li.ok = ends.ok AND li.ln = ends.b),
             |pairs AS (SELECT i, j, CAST(count(*) AS BIGINT) AS c
             |          FROM fi JOIN la ON fi.ok = la.ok GROUP BY 1, 2),
             |canon AS (SELECT least(i, j) AS lo, greatest(i, j) AS hi,
             |            CAST(sum(CASE WHEN i < j THEN c ELSE 0 END)
             |              AS BIGINT) AS nij,
             |            CAST(sum(CASE WHEN i > j THEN c ELSE 0 END)
             |              AS BIGINT) AS nji
             |          FROM pairs WHERE i <> j GROUP BY 1, 2)
             |SELECT CAST(count(*) AS BIGINT) AS df,
             |       CAST(sum((nij - nji) * (nij - nji) * 1000000
             |         // (nij + nji)) AS BIGINT) AS chi2_e6
             |FROM canon WHERE nij + nji > 0""".stripMargin))
  )
}
