package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-68 batch: frequent 3-itemsets over order baskets (market-
  * basket triples — the next rung after q_cooc_lift's pairs), blocking-
  * quality metrics (reduction ratio + pair completeness of the
  * q_fellegi_sunter blocking — the ER evaluation that says whether a
  * blocking key is safe), and golden-record survivorship (rule-based
  * canonical attributes per entity cluster — what dedup ships AFTER
  * the clusters are found).
  */
object Round68Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Brand triples with ≥0.1% order support. Baskets are bounded
    //    (≤7 lines/order), so in-basket triple enumeration is the
    //    scale-safe path: one (order) exchange, C(k,3) ≤ 35 per basket.
    QueryDef("q_itemset3",
      (s, d) => {
        val b = Tables.lineitem(s, d)
          .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("br"))
          .distinct()
          .localCheckpoint(false) // three self-join sides + total
        val tot = b.select(col("ok")).distinct()
          .agg(count(lit(1)).as("tot"))
        val x = b.select(col("ok"), col("br").as("b1"))
        val y = b.select(col("ok"), col("br").as("b2"))
        val z = b.select(col("ok"), col("br").as("b3"))
        x.join(y, "ok").where(col("b1") < col("b2"))
          .join(z, "ok").where(col("b2") < col("b3"))
          .groupBy(col("b1"), col("b2"), col("b3"))
          .agg(count(lit(1)).as("supp"))
          .crossJoin(broadcast(tot))
          .where(col("supp") * 1000 >= col("tot"))
          .selectExpr("b1", "b2", "b3", "supp",
            "supp * 1000000 div tot AS share_e6")
      },
      Some("""WITH b AS (
             |  SELECT DISTINCT l_orderkey AS ok, p_brand AS br
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS tot FROM b),
             |t AS (SELECT x.br AS b1, y.br AS b2, z.br AS b3,
             |             CAST(count(*) AS BIGINT) AS supp
             |      FROM b x JOIN b y ON x.ok = y.ok AND x.br < y.br
             |           JOIN b z ON y.ok = z.ok AND y.br < z.br
             |      GROUP BY 1, 2, 3)
             |SELECT b1, b2, b3, supp, supp * 1000000 // tot AS share_e6
             |FROM t CROSS JOIN tot WHERE supp * 1000 >= tot"""
        .stripMargin)),

    // ── Blocking quality of the (nation, balance-bucket) key from
    //    q_fellegi_sunter: candidate reduction vs match recall.
    QueryDef("q_blocking_quality",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey").as("ck"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bc"),
          col("c_nationkey").as("nk"))
        val clean = c.withColumn("blk", expr("(bc + 100000) div 100000"))
        val dirty = c.select(col("ck").as("ck2"),
            when(col("ck") % 11 === 0, col("bc") + 100L)
              .otherwise(col("bc")).as("bc2"),
            col("nk").as("nk2"))
          .withColumn("blk2", expr("(bc2 + 100000) div 100000"))
        val cand = clean.join(dirty,
            col("nk") === col("nk2") && col("blk") === col("blk2"))
          .agg(count(lit(1)).as("n_cand"),
            sum(when(col("ck") === col("ck2"), 1L).otherwise(0L))
              .as("n_match_cand"))
        val n = clean.agg(count(lit(1)).as("n"))
        cand.crossJoin(broadcast(n))
          .selectExpr("n", "n_cand", "n_match_cand",
            "1000000 - n_cand * 1000000 div (n * n) AS reduction_e6",
            "n_match_cand * 1000000 div n AS completeness_e6")
      },
      Some("""WITH c AS (SELECT c_custkey AS ck,
             |                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
             |                   AS bc,
             |                 c_nationkey AS nk
             |          FROM customer),
             |clean AS (SELECT *, (bc + 100000) // 100000 AS blk FROM c),
             |dirty AS (SELECT ck AS ck2,
             |                 CASE WHEN ck % 11 = 0 THEN bc + 100
             |                      ELSE bc END AS bc2,
             |                 nk AS nk2
             |          FROM c),
             |d2 AS (SELECT *, (bc2 + 100000) // 100000 AS blk2 FROM dirty),
             |cand AS (SELECT CAST(count(*) AS BIGINT) AS n_cand,
             |                CAST(sum(CASE WHEN ck = ck2 THEN 1 ELSE 0 END)
             |                  AS BIGINT) AS n_match_cand
             |         FROM clean JOIN d2
             |           ON nk = nk2 AND blk = blk2),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM clean)
             |SELECT n, n_cand, n_match_cand,
             |       1000000 - n_cand * 1000000 // (n * n) AS reduction_e6,
             |       n_match_cand * 1000000 // n AS completeness_e6
             |FROM cand CROSS JOIN n""".stripMargin)),

    // ── Golden record: survivorship rules over the clean + perturbed
    //    version pairs — longest name, clean-priority segment, max
    //    balance; conflict count per entity. Bounded output sample
    //    (ck % 7 = 0) keeps the driver compare light.
    QueryDef("q_golden_record",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey").as("ck"),
          col("c_name").as("nm"), col("c_mktsegment").as("sg"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bc"))
        val clean = c.select(col("ck"), col("nm"), col("sg"), col("bc"),
          lit(0L).as("src"))
        val dirty = c.select(col("ck"),
          when(col("ck") % 7 === 0, concat(col("nm"), lit("X")))
            .otherwise(col("nm")).as("nm"),
          when(col("ck") % 13 === 0, lit("PERTURBED"))
            .otherwise(col("sg")).as("sg"),
          when(col("ck") % 11 === 0, col("bc") + 100L)
            .otherwise(col("bc")).as("bc"),
          lit(1L).as("src"))
        clean.unionByName(dirty).where(col("ck") % 7 === 0)
          .groupBy(col("ck"))
          .agg(
            max(struct(length(col("nm")).as("l"), col("nm").as("v")))
              .getField("v").as("g_name"),
            min(struct(col("src").as("r"), col("sg").as("v")))
              .getField("v").as("g_segment"),
            max(col("bc")).as("g_bal_cents"),
            countDistinct(col("nm")).as("nm_variants"),
            (countDistinct(col("nm")) - 1 + countDistinct(col("sg")) - 1 +
              countDistinct(col("bc")) - 1).as("n_conflicts"))
      },
      Some("""WITH c AS (SELECT c_custkey AS ck, c_name AS nm,
             |                 c_mktsegment AS sg,
             |                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
             |                   AS bc
             |          FROM customer),
             |v AS (
             |  SELECT ck, nm, sg, bc, 0 AS src FROM c
             |  UNION ALL
             |  SELECT ck,
             |         CASE WHEN ck % 7 = 0 THEN nm || 'X' ELSE nm END,
             |         CASE WHEN ck % 13 = 0 THEN 'PERTURBED' ELSE sg END,
             |         CASE WHEN ck % 11 = 0 THEN bc + 100 ELSE bc END,
             |         1
             |  FROM c),
             |vf AS (SELECT * FROM v WHERE ck % 7 = 0),
             |gn AS (SELECT ck, nm AS g_name FROM (
             |         SELECT ck, nm, row_number() OVER (PARTITION BY ck
             |           ORDER BY length(nm) DESC, nm DESC) AS rn FROM vf)
             |       WHERE rn = 1),
             |gs AS (SELECT ck, sg AS g_segment FROM (
             |         SELECT ck, sg, row_number() OVER (PARTITION BY ck
             |           ORDER BY src, sg) AS rn FROM vf)
             |       WHERE rn = 1),
             |ag AS (SELECT ck, CAST(max(bc) AS BIGINT) AS g_bal_cents,
             |              CAST(count(DISTINCT nm) AS BIGINT) AS nm_variants,
             |              CAST(count(DISTINCT nm) - 1
             |                   + count(DISTINCT sg) - 1
             |                   + count(DISTINCT bc) - 1 AS BIGINT)
             |                AS n_conflicts
             |       FROM vf GROUP BY 1)
             |SELECT ag.ck, g_name, g_segment, g_bal_cents, nm_variants,
             |       n_conflicts
             |FROM ag JOIN gn ON ag.ck = gn.ck
             |     JOIN gs ON ag.ck = gs.ck""".stripMargin))
  )
}
