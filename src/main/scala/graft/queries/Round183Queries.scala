package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.functions._

/** Round-183 batch — ordinal/categorical association, epidemiological
  * ratios, distribution drift, char-level generation overlap, and a
  * shape diagnostic:
  *
  *  - Somers' D (`q_somers_d`): asymmetric ordinal association
  *    D_yx = (C−D)/(C+D+T_y) between line quantity and discount. Pair
  *    counts come from a self-join of the BOUNDED (quantity, discount)
  *    contingency table (≤ 50×11 cells → ≤ 3·10⁵ cell pairs at any
  *    data volume) — never row pairs.
  *  - Goodman–Kruskal λ (`q_gk_lambda`): proportional-reduction-in-error
  *    of predicting market segment from nation — (Σ_x max_y n_xy −
  *    max_y n_y)/(n − max_y n_y), exact integers on the 25×5 table.
  *  - Relative risk (`q_relative_risk`): returned-line risk under deep
  *    discount vs not, from the 2×2 (exposure, outcome) table; ln RR in
  *    the shared e6 log₂ fixed point (·ln2), the delta-method standard
  *    error as one closing double chain.
  *  - Jensen–Shannon divergence (`q_jsd_buckets`): symmetric drift
  *    between urgent/relaxed order-value bucket distributions, in BITS:
  *    p_i/m_i = 2·ca·nb/(ca·nb + cb·na) keeps every log argument an
  *    exact integer ratio, so JSD closes as integer log₂ sums — the
  *    same fixed point as q_kl_vocab, no doubles anywhere.
  *  - chrF-2 (`q_chrf2`): character-bigram F_{β=2} over the same
  *    deterministic (even, odd) document pairs q_rouge2 scores — the
  *    tokenizer-free overlap metric; F folds from e6 precision/recall
  *    integers: F = 5PR/(4P+R).
  *  - Bimodality coefficient (`q_bimodality`): (g₁²+1)/(g₂ + correction)
  *    over order values in whole dollars — dollars (not cents) keep the
  *    4th power sum inside decimal(38,0) headroom (5·10⁵⁴ would not
  *    fit for cents at 100 TB row counts); one integer moment pass,
  *    one closing double chain.
  */
object Round183Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Somers' D_yx: y = discount bucket ordered by x = quantity.
    QueryDef("q_somers_d",
      (s, d) => {
        val cells = Tables.lineitem(s, d)
          .select(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("x"),
            expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("y"))
          .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // ≤ 50×11 cells at any SF
        val n = cells.agg(sum(col("c")).as("n"))
        val pairs = cells.crossJoin(
          broadcast(cells.select(col("x").as("x2"), col("y").as("y2"),
            col("c").as("c2"))))
        pairs
          .agg(
            sum(when(col("x2") > col("x") && col("y2") > col("y"),
              expr(s"CAST(c AS $dec) * c2")).otherwise(lit(0L)))
              .as("conc0"),
            sum(when(col("x2") > col("x") && col("y2") < col("y"),
              expr(s"CAST(c AS $dec) * c2")).otherwise(lit(0L)))
              .as("disc0"),
            sum(when(col("x2") > col("x") && col("y2") === col("y"),
              expr(s"CAST(c AS $dec) * c2")).otherwise(lit(0L)))
              .as("ty0"))
          .crossJoin(broadcast(n))
          .selectExpr("n", "CAST(conc0 AS BIGINT) AS conc",
            "CAST(disc0 AS BIGINT) AS disc", "CAST(ty0 AS BIGINT) AS ty",
            s"""CASE WHEN conc0 + disc0 + ty0 = 0 THEN NULL
               |WHEN conc0 >= disc0
               |  THEN CAST((conc0 - disc0) * 1000000
               |    div (conc0 + disc0 + ty0) AS BIGINT)
               |  ELSE -CAST((disc0 - conc0) * 1000000
               |    div (conc0 + disc0 + ty0) AS BIGINT)
               |END AS somers_d_e6""".stripMargin)
      },
      Some("""WITH cells AS (
             |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
             |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM lineitem GROUP BY 1, 2),
             |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
             |agg AS (SELECT
             |          sum(CASE WHEN b.x > a.x AND b.y > a.y
             |            THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END)
             |            AS conc0,
             |          sum(CASE WHEN b.x > a.x AND b.y < a.y
             |            THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END)
             |            AS disc0,
             |          sum(CASE WHEN b.x > a.x AND b.y = a.y
             |            THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END)
             |            AS ty0
             |        FROM cells a CROSS JOIN cells b)
             |SELECT n, CAST(conc0 AS BIGINT) AS conc,
             |       CAST(disc0 AS BIGINT) AS disc,
             |       CAST(ty0 AS BIGINT) AS ty,
             |       CASE WHEN conc0 + disc0 + ty0 = 0 THEN NULL
             |       WHEN conc0 >= disc0
             |         THEN CAST((conc0 - disc0) * 1000000
             |           // (conc0 + disc0 + ty0) AS BIGINT)
             |         ELSE -CAST((disc0 - conc0) * 1000000
             |           // (conc0 + disc0 + ty0) AS BIGINT)
             |       END AS somers_d_e6
             |FROM agg CROSS JOIN n""".stripMargin)),

    // ── Goodman–Kruskal λ: predict segment from nation.
    QueryDef("q_gk_lambda",
      (s, d) => {
        val cells = Tables.customer(s, d)
          .groupBy(col("c_nationkey").as("nk"),
            col("c_mktsegment").as("seg"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // ≤ 25×5 cells
        val rowmax = cells.groupBy(col("nk")).agg(max(col("c")).as("mx"))
          .agg(sum(col("mx")).as("sum_rowmax"))
        val colmax = cells.groupBy(col("seg")).agg(sum(col("c")).as("cc"))
          .agg(max(col("cc")).as("max_col"))
        val n = cells.agg(sum(col("c")).as("n"))
        rowmax.crossJoin(broadcast(colmax)).crossJoin(broadcast(n))
          .selectExpr("n", "sum_rowmax", "max_col",
            """CASE WHEN n = max_col THEN NULL
              |ELSE (sum_rowmax - max_col) * 1000000 div (n - max_col)
              |END AS lambda_e6""".stripMargin)
      },
      Some("""WITH cells AS (
             |  SELECT c_nationkey AS nk, c_mktsegment AS seg,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM customer GROUP BY 1, 2),
             |rowmax AS (SELECT CAST(sum(mx) AS BIGINT) AS sum_rowmax
             |           FROM (SELECT nk, max(c) AS mx FROM cells
             |                 GROUP BY 1)),
             |colmax AS (SELECT CAST(max(cc) AS BIGINT) AS max_col
             |           FROM (SELECT seg, sum(c) AS cc FROM cells
             |                 GROUP BY 1)),
             |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
             |SELECT n, sum_rowmax, max_col,
             |       CASE WHEN n = max_col THEN NULL
             |       ELSE (sum_rowmax - max_col) * 1000000 // (n - max_col)
             |       END AS lambda_e6
             |FROM rowmax CROSS JOIN colmax CROSS JOIN n""".stripMargin)),

    // ── Relative risk of a return under deep discount (≥ 6%).
    QueryDef("q_relative_risk",
      (s, d) => Tables.lineitem(s, d)
        .select((col("l_discount") >= 0.06).as("exp"),
          (col("l_returnflag") === "R").as("ret"))
        .agg(
          sum(when(col("exp") && col("ret"), 1L).otherwise(0L)).as("a"),
          sum(when(col("exp") && !col("ret"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("exp") && col("ret"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("exp") && !col("ret"), 1L).otherwise(0L)).as("d"))
        // log args stay BIGINT (the shared log₂ shifts need an integral
        // type in both engines; a·(c+d) ≤ ~10¹² here)
        .withColumn("l1",
          Bm25.log2E6(greatest(expr("a * (c + d)"), lit(1L))))
        .withColumn("l2",
          Bm25.log2E6(greatest(expr("c * (a + b)"), lit(1L))))
        .selectExpr("a", "b", "c", "d",
          s"""CASE WHEN c = 0 OR a + b = 0 THEN NULL
             |ELSE CAST(CAST(a AS $dec) * (c + d) * 1000000
             |  div (CAST(c AS $dec) * (a + b)) AS BIGINT)
             |END AS rr_e6""".stripMargin,
          """CASE WHEN a = 0 OR c = 0 THEN NULL
            |ELSE CAST(CAST(l1 - l2 AS decimal(38,0)) * 693147
            |  div 1000000 AS BIGINT)
            |END AS ln_rr_e6""".stripMargin,
          // delta-method se of ln RR: √(1/a − 1/(a+b) + 1/c − 1/(c+d))
          """CASE WHEN a = 0 OR c = 0 THEN NULL
            |ELSE round(sqrt(CAST('1.0' AS DOUBLE) / CAST(a AS DOUBLE)
            |  - CAST('1.0' AS DOUBLE) / CAST(a + b AS DOUBLE)
            |  + CAST('1.0' AS DOUBLE) / CAST(c AS DOUBLE)
            |  - CAST('1.0' AS DOUBLE) / CAST(c + d AS DOUBLE)), 6)
            |END AS se_ln_rr""".stripMargin),
      Some {
        val l1 = Bm25.log2E6Sql("greatest(a * (c + d), 1)")
        val l2 = Bm25.log2E6Sql("greatest(c * (a + b), 1)")
        s"""WITH t AS (
           |  SELECT CAST(sum(CASE WHEN l_discount >= 0.06
           |           AND l_returnflag = 'R' THEN 1 ELSE 0 END)
           |           AS BIGINT) AS a,
           |         CAST(sum(CASE WHEN l_discount >= 0.06
           |           AND l_returnflag <> 'R' THEN 1 ELSE 0 END)
           |           AS BIGINT) AS b,
           |         CAST(sum(CASE WHEN l_discount < 0.06
           |           AND l_returnflag = 'R' THEN 1 ELSE 0 END)
           |           AS BIGINT) AS c,
           |         CAST(sum(CASE WHEN l_discount < 0.06
           |           AND l_returnflag <> 'R' THEN 1 ELSE 0 END)
           |           AS BIGINT) AS d
           |  FROM lineitem)
           |SELECT a, b, c, d,
           |       CASE WHEN c = 0 OR a + b = 0 THEN NULL
           |       ELSE CAST(CAST(a AS HUGEINT) * (c + d) * 1000000
           |         // (CAST(c AS HUGEINT) * (a + b)) AS BIGINT)
           |       END AS rr_e6,
           |       CASE WHEN a = 0 OR c = 0 THEN NULL
           |       ELSE CAST(CAST($l1 - $l2 AS HUGEINT) * 693147
           |         // 1000000 AS BIGINT)
           |       END AS ln_rr_e6,
           |       CASE WHEN a = 0 OR c = 0 THEN NULL
           |       ELSE round(sqrt(CAST('1.0' AS DOUBLE) / CAST(a AS DOUBLE)
           |         - CAST('1.0' AS DOUBLE) / CAST(a + b AS DOUBLE)
           |         + CAST('1.0' AS DOUBLE) / CAST(c AS DOUBLE)
           |         - CAST('1.0' AS DOUBLE) / CAST(c + d AS DOUBLE)), 6)
           |       END AS se_ln_rr
           |FROM t""".stripMargin
      }),

    // ── Jensen–Shannon divergence (bits) between urgent/relaxed
    //    order-value bucket distributions.
    QueryDef("q_jsd_buckets",
      (s, d) => {
        val g = Tables.orders(s, d)
          .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)" +
            " div 100000").as("bucket"),
            col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("urgent"))
          .groupBy(col("bucket"))
          .agg(sum(when(col("urgent"), 1L).otherwise(0L)).as("ca"),
            sum(when(col("urgent"), 0L).otherwise(1L)).as("cb"))
        val tot = g.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        // log arguments stay BIGINT (2·c·n ≤ ~10¹⁸ headroom; the shared
        // log₂ shifts need an integral type in both engines)
        val t = g.crossJoin(broadcast(tot))
          .withColumn("mnum", expr("ca * nb + cb * na"))
          // p_i/m_i = 2·ca·nb / mnum ; q_i/m_i = 2·cb·na / mnum
          .withColumn("ta",
            when(col("ca") > 0,
              expr(s"CAST(ca AS $dec)") *
                (Bm25.log2E6(expr("2L * ca * nb")) -
                  Bm25.log2E6(col("mnum")))).otherwise(lit(0L)))
          .withColumn("tb",
            when(col("cb") > 0,
              expr(s"CAST(cb AS $dec)") *
                (Bm25.log2E6(expr("2L * cb * na")) -
                  Bm25.log2E6(col("mnum")))).otherwise(lit(0L)))
        // each KL is ≥ 0 exactly; the 5-bit mantissa can dip a hair
        // below zero near 0 — clamp so the output can never read as a
        // (nonsensical) negative divergence
        t.agg(count(lit(1)).as("n_buckets"), max(col("na")).as("na"),
            max(col("nb")).as("nb"),
            greatest(sum(col("ta")), lit(0L)).as("sa"),
            greatest(sum(col("tb")), lit(0L)).as("sb"))
          .selectExpr("na", "nb", "n_buckets",
            s"CAST((sa div CAST(na AS $dec)" +
              s" + sb div CAST(nb AS $dec)) div 2 AS BIGINT) AS jsd_e6")
      },
      Some {
        val la = Bm25.log2E6Sql("2 * ca * nb")
        val lb = Bm25.log2E6Sql("2 * cb * na")
        val lm = Bm25.log2E6Sql("mnum")
        s"""WITH b AS (
           |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
           |           // 100000 AS bucket,
           |         o_orderpriority IN ('1-URGENT', '2-HIGH') AS urgent
           |  FROM orders),
           |g AS (SELECT bucket,
           |        CAST(sum(CASE WHEN urgent THEN 1 ELSE 0 END)
           |          AS BIGINT) AS ca,
           |        CAST(sum(CASE WHEN urgent THEN 0 ELSE 1 END)
           |          AS BIGINT) AS cb
           |      FROM b GROUP BY 1),
           |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
           |               CAST(sum(cb) AS BIGINT) AS nb FROM g),
           |c AS (SELECT bucket, ca, cb, na, nb,
           |        ca * nb + cb * na AS mnum
           |      FROM g CROSS JOIN tot),
           |terms AS (SELECT na, nb,
           |            CASE WHEN ca > 0 THEN
           |              CAST(ca AS HUGEINT) * ($la - $lm) ELSE 0 END
           |              AS ta,
           |            CASE WHEN cb > 0 THEN
           |              CAST(cb AS HUGEINT) * ($lb - $lm) ELSE 0 END
           |              AS tb
           |          FROM c),
           |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           |          max(na) AS na, max(nb) AS nb,
           |          greatest(sum(ta), 0) AS sa, greatest(sum(tb), 0)
           |            AS sb
           |        FROM terms)
           |SELECT na, nb, n_buckets,
           |       CAST((sa // CAST(na AS HUGEINT)
           |         + sb // CAST(nb AS HUGEINT)) // 2 AS BIGINT)
           |         AS jsd_e6
           |FROM agg""".stripMargin
      }),

    // ── chrF-2: char-bigram F_{β=2} over (even, odd) doc pairs.
    QueryDef("q_chrf2",
      (s, d) => {
        val pd = Tables.documents(s, d)
          .select(expr("doc_id div 2").as("pair"),
            (col("doc_id") % 2).as("role"), col("text"))
          .filter(length(col("text")) >= 2)
        // r12: substring(text, i, 2) re-scans the string from offset 0
        // for every i (UTF8String char addressing), making the bigram
        // expansion O(len²) per document; one split('') plus a zip_with
        // of the two shifted slices emits the IDENTICAL bigram sequence
        // in O(len). Guide §1.2 step 2 (per-task work).
        val cnt = pd.withColumn("cs", split(col("text"), ""))
          .select(col("pair"), col("role"),
            explode(expr("zip_with(slice(cs, 1, length(text) - 1)," +
              " slice(cs, 2, length(text) - 1), (x, y) -> concat(x, y))"))
              .as("g"))
          .groupBy(col("pair"), col("role"), col("g"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // shared by match / hyp / ref legs
        val m = cnt.filter(col("role") === 0)
          .select(col("pair"), col("g"), col("c").as("hc"))
          .join(cnt.filter(col("role") === 1)
            .select(col("pair"), col("g"), col("c").as("rc")),
            Seq("pair", "g"))
          .agg(sum(least(col("hc"), col("rc"))).as("match2"))
        val tot = cnt.groupBy(col("role")).agg(sum(col("c")).as("t"))
        val hyp = tot.filter(col("role") === 0).selectExpr("t AS hyp2")
        val ref = tot.filter(col("role") === 1).selectExpr("t AS ref2")
        val np = pd.agg(countDistinct(col("pair")).as("n_pairs"))
        m.crossJoin(broadcast(hyp)).crossJoin(broadcast(ref))
          .crossJoin(broadcast(np))
          .withColumn("p_e6", expr("match2 * 1000000 div hyp2"))
          .withColumn("r_e6", expr("match2 * 1000000 div ref2"))
          .selectExpr("n_pairs", "match2", "hyp2", "ref2", "p_e6", "r_e6",
            s"""CASE WHEN 4 * p_e6 + r_e6 = 0 THEN 0
               |ELSE CAST(CAST(5 AS $dec) * p_e6 * r_e6
               |  div (4 * p_e6 + r_e6) AS BIGINT)
               |END AS chrf2_e6""".stripMargin)
      },
      Some("""WITH pd AS (
             |  SELECT doc_id // 2 AS pair, doc_id % 2 AS role, text
             |  FROM documents WHERE length(text) >= 2),
             |cnt AS (SELECT pair, role, g, CAST(count(*) AS BIGINT) AS c
             |        FROM (SELECT pair, role,
             |                unnest(list_transform(
             |                  range(1, length(text)),
             |                  i -> substr(text, i, 2))) AS g
             |              FROM pd)
             |        GROUP BY 1, 2, 3),
             |m AS (SELECT CAST(sum(least(h.c, r.c)) AS BIGINT) AS match2
             |      FROM cnt h JOIN cnt r
             |        ON h.pair = r.pair AND h.g = r.g
             |       AND h.role = 0 AND r.role = 1),
             |hyp AS (SELECT CAST(sum(c) AS BIGINT) AS hyp2 FROM cnt
             |        WHERE role = 0),
             |ref AS (SELECT CAST(sum(c) AS BIGINT) AS ref2 FROM cnt
             |        WHERE role = 1),
             |np AS (SELECT CAST(count(DISTINCT pair) AS BIGINT)
             |         AS n_pairs FROM pd),
             |e AS (SELECT n_pairs, match2, hyp2, ref2,
             |        match2 * 1000000 // hyp2 AS p_e6,
             |        match2 * 1000000 // ref2 AS r_e6
             |      FROM m CROSS JOIN hyp CROSS JOIN ref CROSS JOIN np)
             |SELECT n_pairs, match2, hyp2, ref2, p_e6, r_e6,
             |       CASE WHEN 4 * p_e6 + r_e6 = 0 THEN 0
             |       ELSE CAST(CAST(5 AS HUGEINT) * p_e6 * r_e6
             |         // (4 * p_e6 + r_e6) AS BIGINT)
             |       END AS chrf2_e6
             |FROM e""".stripMargin)),

    // ── Bimodality coefficient over order values (whole dollars).
    QueryDef("q_bimodality",
      (s, d) => Tables.orders(s, d)
        .select(expr("CAST(floor(o_totalprice + 0.5) AS BIGINT)").as("x"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
          sum(expr(s"CAST(x AS $dec) * x")).as("s2"),
          sum(expr(s"CAST(x AS $dec) * x * x")).as("s3"),
          sum(expr(s"CAST(x AS $dec) * x * x * x")).as("s4"))
        .selectExpr("n",
          // central moments from raw power sums, all in doubles from
          // exact integer sums (one deterministic chain, round 6):
          // m2 = s2/n − μ², m3 = s3/n − 3μ s2/n + 2μ³,
          // m4 = s4/n − 4μ s3/n + 6μ² s2/n − 3μ⁴
          """round((power(
            |    (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
            |     - CAST('3.0' AS DOUBLE) * (CAST(s1 AS DOUBLE)
            |       / CAST(n AS DOUBLE)) * (CAST(s2 AS DOUBLE)
            |       / CAST(n AS DOUBLE))
            |     + CAST('2.0' AS DOUBLE) * power(CAST(s1 AS DOUBLE)
            |       / CAST(n AS DOUBLE), CAST('3.0' AS DOUBLE)))
            |    / power(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
            |      - power(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE),
            |        CAST('2.0' AS DOUBLE)), CAST('1.5' AS DOUBLE)),
            |    CAST('2.0' AS DOUBLE)) + CAST('1.0' AS DOUBLE))
            |  / ((CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
            |      - CAST('4.0' AS DOUBLE) * (CAST(s1 AS DOUBLE)
            |        / CAST(n AS DOUBLE)) * (CAST(s3 AS DOUBLE)
            |        / CAST(n AS DOUBLE))
            |      + CAST('6.0' AS DOUBLE) * power(CAST(s1 AS DOUBLE)
            |        / CAST(n AS DOUBLE), CAST('2.0' AS DOUBLE))
            |        * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
            |      - CAST('3.0' AS DOUBLE) * power(CAST(s1 AS DOUBLE)
            |        / CAST(n AS DOUBLE), CAST('4.0' AS DOUBLE)))
            |    / power(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
            |      - power(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE),
            |        CAST('2.0' AS DOUBLE)), CAST('2.0' AS DOUBLE))
            |    - CAST('3.0' AS DOUBLE)
            |    + CAST('3.0' AS DOUBLE) * CAST(n - 1 AS DOUBLE)
            |      * CAST(n - 1 AS DOUBLE) / (CAST(n - 2 AS DOUBLE)
            |      * CAST(n - 3 AS DOUBLE))), 6) AS bc""".stripMargin),
      Some("""WITH t AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(x) AS BIGINT) AS s1,
             |         sum(CAST(x AS HUGEINT) * x) AS s2,
             |         sum(CAST(x AS HUGEINT) * x * x) AS s3,
             |         sum(CAST(x AS HUGEINT) * x * x * x) AS s4
             |  FROM (SELECT CAST(floor(o_totalprice + 0.5) AS BIGINT)
             |          AS x FROM orders))
             |SELECT n,
             |       round((power(
             |           (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
             |            - CAST('3.0' AS DOUBLE) * (CAST(s1 AS DOUBLE)
             |              / CAST(n AS DOUBLE)) * (CAST(s2 AS DOUBLE)
             |              / CAST(n AS DOUBLE))
             |            + CAST('2.0' AS DOUBLE) * power(CAST(s1 AS DOUBLE)
             |              / CAST(n AS DOUBLE), CAST('3.0' AS DOUBLE)))
             |           / power(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
             |             - power(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE),
             |               CAST('2.0' AS DOUBLE)), CAST('1.5' AS DOUBLE)),
             |           CAST('2.0' AS DOUBLE)) + CAST('1.0' AS DOUBLE))
             |         / ((CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
             |             - CAST('4.0' AS DOUBLE) * (CAST(s1 AS DOUBLE)
             |               / CAST(n AS DOUBLE)) * (CAST(s3 AS DOUBLE)
             |               / CAST(n AS DOUBLE))
             |             + CAST('6.0' AS DOUBLE) * power(CAST(s1 AS DOUBLE)
             |               / CAST(n AS DOUBLE), CAST('2.0' AS DOUBLE))
             |               * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
             |             - CAST('3.0' AS DOUBLE) * power(CAST(s1 AS DOUBLE)
             |               / CAST(n AS DOUBLE), CAST('4.0' AS DOUBLE)))
             |           / power(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
             |             - power(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE),
             |               CAST('2.0' AS DOUBLE)), CAST('2.0' AS DOUBLE))
             |           - CAST('3.0' AS DOUBLE)
             |           + CAST('3.0' AS DOUBLE) * CAST(n - 1 AS DOUBLE)
             |             * CAST(n - 1 AS DOUBLE) / (CAST(n - 2 AS DOUBLE)
             |             * CAST(n - 3 AS DOUBLE))), 6) AS bc
             |FROM t""".stripMargin))
  )
}
