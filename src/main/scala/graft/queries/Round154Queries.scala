package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-154 batch:
  *
  *  - Shift-share decomposition (`q_shift_share`): each nation's
  *    1996→97 revenue growth split into the national-trend effect, the
  *    industry-mix effect (was the nation weighted toward growing
  *    brands?), and the local-competitiveness residual — the regional-
  *    economics standard. Identity: actual = national + mix +
  *    competitive holds exactly because the residual is defined by
  *    subtraction.
  *  - Nearest-neighbor matching ATT (`q_nn_matching_att`): match each
  *    treated customer to the closest control on 1996 spend WITHIN a
  *    ⅛-log₂ band (bucketed candidates — the band granularity is the
  *    scale lever, same story as the KNN grid), then average the
  *    outcome differences. The causal suite's non-parametric member
  *    next to q_panel_fe / q_synth_control.
  *  - TextTiling-lite (`q_text_tiling`): cosine similarity between
  *    adjacent 20-token blocks per document; a dip below 0.2 marks a
  *    topic boundary — the classic unsupervised document segmenter,
  *    as block-count vectors + one adjacent-block join. One
  *    floor(sqrt(double)) per block pair in fixed order.
  */
object Round154Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Shift-share over nation×brand revenue cells: rates e6 with
    //    sign-factored division; effects in cents via r96·g div 1e6.
    QueryDef("q_shift_share",
      (s, d) => {
        val cell = Tables.lineitem(s, d)
          .filter(expr("year(l_shipdate) IN (1996, 1997)"))
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("s_nationkey").as("nk"), col("p_brand").as("b"))
          .agg(sum(when(expr("year(l_shipdate) = 1996"),
            expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
            .otherwise(0L)).as("r96"),
            sum(when(expr("year(l_shipdate) = 1997"),
              expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
              .otherwise(0L)).as("r97"))
          .localCheckpoint(false)
        val nat = cell.agg(sum(col("r96")).as("n96"), sum(col("r97")).as("n97"))
          .selectExpr("""CASE WHEN n97 >= n96
            |  THEN (n97 - n96) * 1000000 div greatest(1L, n96)
            |  ELSE -((n96 - n97) * 1000000 div greatest(1L, n96))
            |END AS g_nat""".stripMargin)
        val br = cell.groupBy(col("b"))
          .agg(sum(col("r96")).as("b96"), sum(col("r97")).as("b97"))
          .selectExpr("b", """CASE WHEN b97 >= b96
            |  THEN (b97 - b96) * 1000000 div greatest(1L, b96)
            |  ELSE -((b96 - b97) * 1000000 div greatest(1L, b96))
            |END AS g_b""".stripMargin)
        cell.join(broadcast(br), "b").crossJoin(broadcast(nat))
          .selectExpr("nk", "r97 - r96 AS actual",
            """CASE WHEN g_nat >= 0 THEN r96 * g_nat div 1000000
              |ELSE -(r96 * (-g_nat) div 1000000) END AS nat_eff"""
              .stripMargin,
            """CASE WHEN g_b - g_nat >= 0
              |  THEN r96 * (g_b - g_nat) div 1000000
              |  ELSE -(r96 * (g_nat - g_b) div 1000000)
              |END AS mix_eff""".stripMargin)
          .groupBy(col("nk"))
          .agg(sum(col("actual")).as("actual_cents"),
            sum(col("nat_eff")).as("national_cents"),
            sum(col("mix_eff")).as("mix_cents"))
          .selectExpr("CAST(nk AS BIGINT) AS nationkey",
            "CAST(actual_cents AS BIGINT) AS actual_cents",
            "CAST(national_cents AS BIGINT) AS national_cents",
            "CAST(mix_cents AS BIGINT) AS mix_cents",
            "actual_cents - national_cents - mix_cents AS competitive_cents")
      },
      Some("""WITH cell AS (
             |  SELECT s.s_nationkey AS nk, p.p_brand AS b,
             |         CAST(sum(CASE WHEN year(l.l_shipdate) = 1996
             |           THEN CAST(floor(l.l_extendedprice * 100 + 0.5)
             |             AS BIGINT) ELSE 0 END) AS BIGINT) AS r96,
             |         CAST(sum(CASE WHEN year(l.l_shipdate) = 1997
             |           THEN CAST(floor(l.l_extendedprice * 100 + 0.5)
             |             AS BIGINT) ELSE 0 END) AS BIGINT) AS r97
             |  FROM lineitem l
             |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |  JOIN part p ON l.l_partkey = p.p_partkey
             |  WHERE year(l.l_shipdate) IN (1996, 1997) GROUP BY 1, 2),
             |nat AS (SELECT CASE WHEN sum(r97) >= sum(r96)
             |          THEN CAST((sum(r97) - sum(r96)) * 1000000
             |            // greatest(1, sum(r96)) AS BIGINT)
             |          ELSE -CAST((sum(r96) - sum(r97)) * 1000000
             |            // greatest(1, sum(r96)) AS BIGINT)
             |        END AS g_nat FROM cell),
             |br AS (SELECT b, CASE WHEN sum(r97) >= sum(r96)
             |         THEN CAST((sum(r97) - sum(r96)) * 1000000
             |           // greatest(1, sum(r96)) AS BIGINT)
             |         ELSE -CAST((sum(r96) - sum(r97)) * 1000000
             |           // greatest(1, sum(r96)) AS BIGINT)
             |       END AS g_b FROM cell GROUP BY 1),
             |eff AS (
             |  SELECT c.nk, c.r97 - c.r96 AS actual,
             |         CASE WHEN nat.g_nat >= 0
             |           THEN c.r96 * nat.g_nat // 1000000
             |           ELSE -(c.r96 * (-nat.g_nat) // 1000000)
             |         END AS nat_eff,
             |         CASE WHEN br.g_b - nat.g_nat >= 0
             |           THEN c.r96 * (br.g_b - nat.g_nat) // 1000000
             |           ELSE -(c.r96 * (nat.g_nat - br.g_b) // 1000000)
             |         END AS mix_eff
             |  FROM cell c JOIN br ON c.b = br.b CROSS JOIN nat),
             |a AS (SELECT nk, CAST(sum(actual) AS BIGINT) AS actual_cents,
             |        CAST(sum(nat_eff) AS BIGINT) AS national_cents,
             |        CAST(sum(mix_eff) AS BIGINT) AS mix_cents
             |      FROM eff GROUP BY 1)
             |SELECT CAST(nk AS BIGINT) AS nationkey, actual_cents,
             |       national_cents, mix_cents,
             |       actual_cents - national_cents - mix_cents
             |         AS competitive_cents
             |FROM a""".stripMargin)),

    // ── 1-NN matching ATT: treated = even custkey; covariate = 1996
    //    spend; outcome = 1997 spend. Candidates share the treated
    //    unit's ⅛-log₂ spend band; nearest |x_t − x_c|, ties → smaller
    //    control key. Unmatched treated are counted, not imputed.
    QueryDef("q_nn_matching_att",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val cu = Tables.orders(s, d)
          .filter(expr("year(o_orderdate) IN (1996, 1997)"))
          .groupBy(col("o_custkey"))
          .agg(sum(when(expr("year(o_orderdate) = 1996"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .otherwise(0L)).as("x"),
            sum(when(expr("year(o_orderdate) = 1997"),
              expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
              .otherwise(0L)).as("y"))
          .filter(col("x") > 0L)
          .select(col("o_custkey"), col("x"), col("y"),
            graft.ops.Bm25.log2E6(col("x")).as("l"))
          .selectExpr("o_custkey", "x", "y", "l div 125000 AS band",
            "o_custkey % 2 = 0 AS treated")
          .localCheckpoint(false)
        val t = cu.filter(col("treated"))
          .select(col("o_custkey").as("tk"), col("x").as("tx"),
            col("y").as("ty"), col("band"))
        val c = cu.filter(!col("treated"))
          .select(col("o_custkey").as("ck"), col("x").as("cx"),
            col("y").as("cy"), col("band"))
        val matched = t.join(c, "band")
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("tk"))
              .orderBy(abs(col("tx") - col("cx")), col("ck"))))
          .filter(col("rk") === 1)
        val att = matched.agg(count(lit(1)).as("n_matched"),
          sum(col("ty") - col("cy")).as("sdiff"))
        t.agg(count(lit(1)).as("n_treated")).crossJoin(broadcast(att))
          .selectExpr("CAST(n_treated AS BIGINT) AS n_treated",
            "CAST(n_matched AS BIGINT) AS n_matched",
            """CASE WHEN sdiff >= 0 THEN sdiff div n_matched
              |ELSE -((-sdiff) div n_matched) END AS att_cents"""
              .stripMargin)
      },
      Some {
        val logX = graft.ops.Bm25.log2E6Sql("x")
        s"""WITH cu AS (
           |  SELECT o_custkey,
           |         CAST(sum(CASE WHEN year(o_orderdate) = 1996
           |           THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
           |           ELSE 0 END) AS BIGINT) AS x,
           |         CAST(sum(CASE WHEN year(o_orderdate) = 1997
           |           THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
           |           ELSE 0 END) AS BIGINT) AS y
           |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
           |  GROUP BY 1),
           |b AS (SELECT o_custkey, x, y, ($logX) // 125000 AS band,
           |             o_custkey % 2 = 0 AS treated
           |      FROM cu WHERE x > 0),
           |t AS (SELECT o_custkey AS tk, x AS tx, y AS ty, band
           |      FROM b WHERE treated),
           |c AS (SELECT o_custkey AS ck, x AS cx, y AS cy, band
           |      FROM b WHERE NOT treated),
           |m AS (SELECT t.tk, t.ty, c.cy
           |      FROM t JOIN c ON t.band = c.band
           |      QUALIFY row_number() OVER (PARTITION BY t.tk
           |        ORDER BY abs(t.tx - c.cx), c.ck) = 1),
           |att AS (SELECT CAST(count(*) AS BIGINT) AS n_matched,
           |               CAST(sum(ty - cy) AS BIGINT) AS sdiff FROM m),
           |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_treated FROM t)
           |SELECT n_treated, n_matched,
           |       CASE WHEN sdiff >= 0 THEN sdiff // n_matched
           |         ELSE -((-sdiff) // n_matched) END AS att_cents
           |FROM nt CROSS JOIN att""".stripMargin
      }),

    // ── TextTiling-lite: 20-token blocks per document (empty tokens
    //    excluded from counts but not from positions — same rule both
    //    engines); cosine between adjacent blocks; boundary when
    //    sim < 0.2. Per doc: blocks, boundaries, mean similarity.
    QueryDef("q_text_tiling",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .filter(col("col") =!= "")
          .selectExpr("doc_id", "col AS word", "pos div 20 AS blk")
        val bw = tok.groupBy(col("doc_id"), col("blk"), col("word"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(false)
        val norms = bw.groupBy(col("doc_id"), col("blk"))
          .agg(sum(col("cnt") * col("cnt")).as("nrm"))
        val dots = bw
          .join(bw.selectExpr("doc_id", "blk - 1 AS blk", "word",
            "cnt AS cnt2"), Seq("doc_id", "blk", "word"))
          .groupBy(col("doc_id"), col("blk"))
          .agg(sum(col("cnt") * col("cnt2")).as("dot"))
        val sims = norms
          .join(norms.selectExpr("doc_id", "blk - 1 AS blk",
            "nrm AS nrm2"), Seq("doc_id", "blk"))
          .join(dots, Seq("doc_id", "blk"), "left")
          .selectExpr("doc_id",
            """coalesce(dot, 0L) * 1000000 div greatest(1L,
              |  CAST(floor(sqrt(CAST(nrm * nrm2 AS DOUBLE)))
              |    AS BIGINT)) AS sim_e6""".stripMargin)
        sims.groupBy(col("doc_id"))
          .agg((count(lit(1)) + 1).as("n_blocks"),
            sum(when(col("sim_e6") < 200000L, 1L).otherwise(0L))
              .as("n_boundaries"),
            expr("sum(sim_e6) div count(*)").as("mean_sim_e6"))
          .selectExpr("doc_id", "CAST(n_blocks AS BIGINT) AS n_blocks",
            "CAST(n_boundaries AS BIGINT) AS n_boundaries",
            "mean_sim_e6")
      },
      Some("""WITH tok0 AS (
             |  SELECT doc_id,
             |         unnest(list_transform(generate_series(1, len(ws)),
             |           i -> struct_pack(w := ws[i], b := (i - 1) // 20)))
             |           AS s
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
             |        FROM documents) t),
             |tok AS (SELECT doc_id, s.w AS word, s.b AS blk
             |        FROM tok0 WHERE s.w <> ''),
             |bw AS (SELECT doc_id, blk, word,
             |              CAST(count(*) AS BIGINT) AS cnt
             |       FROM tok GROUP BY 1, 2, 3),
             |norms AS (SELECT doc_id, blk,
             |                 CAST(sum(cnt * cnt) AS BIGINT) AS nrm
             |          FROM bw GROUP BY 1, 2),
             |dots AS (SELECT a.doc_id, a.blk,
             |                CAST(sum(a.cnt * b.cnt) AS BIGINT) AS dot
             |         FROM bw a JOIN bw b ON a.doc_id = b.doc_id
             |           AND b.blk = a.blk + 1 AND a.word = b.word
             |         GROUP BY 1, 2),
             |sims AS (
             |  SELECT n1.doc_id,
             |         coalesce(d.dot, 0) * 1000000 // greatest(1,
             |           CAST(floor(sqrt(CAST(n1.nrm * n2.nrm AS DOUBLE)))
             |             AS BIGINT)) AS sim_e6
             |  FROM norms n1 JOIN norms n2 ON n1.doc_id = n2.doc_id
             |    AND n2.blk = n1.blk + 1
             |  LEFT JOIN dots d ON d.doc_id = n1.doc_id
             |    AND d.blk = n1.blk)
             |SELECT doc_id,
             |       CAST(count(*) + 1 AS BIGINT) AS n_blocks,
             |       CAST(sum(CASE WHEN sim_e6 < 200000 THEN 1 ELSE 0
             |         END) AS BIGINT) AS n_boundaries,
             |       CAST(sum(sim_e6) // count(*) AS BIGINT) AS mean_sim_e6
             |FROM sims GROUP BY 1""".stripMargin))
  )
}
