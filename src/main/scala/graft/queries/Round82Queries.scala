package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-82 batch, two-sample machinery beyond KS: a Q-Q decile map
  * (the quantile-normalization transform aligning one source's length
  * distribution onto another's), exact energy distance (the
  * E-statistic via gap×straddling-pairs — sensitive to ANY
  * distributional difference, where q_ks_test sees only the max CDF
  * gap), and the Cramér–von Mises statistic (the integrated squared
  * CDF gap — the L² companion to KS's L∞). All three ride one merged
  * ordered sweep with exact integer cumulative counts.
  */
object Round82Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Q-Q decile map: en length deciles → non-en lengths at the same
    //    quantile (positional on both sides).
    QueryDef("q_qq_map",
      (s, d) => {
        // Quantile ladders over the distinct-LENGTH axis (cells → cum
        // counts → value at position ⌈k·n/10⌉): the selected value is
        // identical to the positional pick, and every window runs over
        // length cells — never a single-partition sort of the corpus.
        val cells = Tables.documents(s, d)
          .select((col("lang") === "en").as("isA"), col("n_chars"))
          .groupBy(col("isA"), col("n_chars"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // both quantile ladders
        def ladder(isA: Boolean, nm: String) = {
          val side = cells.where(col("isA") === isA)
            .withColumn("cum", sum(col("c")).over(
              Window.orderBy(col("n_chars"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .withColumn("n", sum(col("c")).over(Window.partitionBy(lit(1))))
          (1 to 9).map { k =>
            side.where(col("cum") >= expr(s"($k * n + 9) div 10") &&
                col("cum") - col("c") < expr(s"($k * n + 9) div 10"))
              .select(lit(k.toLong).as("decile"), col("n_chars").as(nm))
          }.reduce(_ unionByName _)
        }
        ladder(isA = true, "len_en").join(ladder(isA = false, "len_other"),
            "decile")
          .withColumn("shift", col("len_other") - col("len_en"))
      },
      Some {
        def ladder(cond: String, nm: String) =
          (1 to 9).map { k =>
            s"""SELECT CAST($k AS BIGINT) AS decile, n_chars AS $nm
               |FROM (SELECT n_chars, row_number() OVER (ORDER BY n_chars,
               |        doc_id) AS rn, count(*) OVER () AS n
               |      FROM documents WHERE $cond)
               |WHERE rn = ($k * n + 9) // 10""".stripMargin
          }.mkString("\nUNION ALL\n")
        s"""WITH a AS (${ladder("lang = 'en'", "len_en")}),
           |b AS (${ladder("lang <> 'en'", "len_other")})
           |SELECT a.decile, len_en, len_other,
           |       len_other - len_en AS shift
           |FROM a JOIN b ON a.decile = b.decile""".stripMargin
      }),

    // ── Energy distance: Σ|x−y| per pair class from consecutive-gap ×
    //    straddling-pair counts on the merged order; exact integers,
    //    one double close.
    QueryDef("q_energy_distance",
      (s, d) => {
        val dec = "decimal(38,0)"
        // Gap sweep over the distinct-VALUE axis: rows within a tie
        // contribute zero gap, so cumulative counts at each distinct
        // value (inclusive of its ties) reproduce the per-doc sweep
        // exactly — and every window walks value cells, never the
        // corpus (no single-partition doc sort).
        val cells = Tables.documents(s, d)
          .select((col("lang") === "en").as("isA"), col("n_chars").as("v"))
          .groupBy(col("v"))
          .agg(sum(when(col("isA"), 1L).otherwise(0L)).as("a_c"),
            sum(when(!col("isA"), 1L).otherwise(0L)).as("b_c"))
        val w = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sweep = cells
          .withColumn("ca", sum(col("a_c")).over(w))
          .withColumn("cb", sum(col("b_c")).over(w))
          .withColumn("nxt", lead(col("v"), 1).over(Window.orderBy(col("v"))))
          .withColumn("na", sum(col("a_c")).over(Window.partitionBy(lit(1))))
          .withColumn("nb", sum(col("b_c")).over(Window.partitionBy(lit(1))))
          .where(col("nxt").isNotNull)
          .withColumn("gap", (col("nxt") - col("v")).cast(dec))
        sweep.agg(
            max(col("na")).as("na"), max(col("nb")).as("nb"),
            sum(expr("gap * (ca * (nb - cb) + cb * (na - ca))")).as("sxy"),
            sum(expr("gap * (ca * (na - ca))")).as("sxx"),
            sum(expr("gap * (cb * (nb - cb))")).as("syy"))
          .selectExpr("na", "nb",
            "CAST(sxy AS BIGINT) AS sum_cross_abs",
            """round(CAST('2.0' AS DOUBLE) * CAST(sxy AS DOUBLE)
              |/ (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
              |- CAST('2.0' AS DOUBLE) * CAST(sxx AS DOUBLE)
              |/ (CAST(na AS DOUBLE) * CAST(na AS DOUBLE))
              |- CAST('2.0' AS DOUBLE) * CAST(syy AS DOUBLE)
              |/ (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
              |AS energy""".stripMargin)
      },
      Some("""WITH v AS (SELECT lang = 'en' AS isA, n_chars AS v, doc_id
             |          FROM documents),
             |tot AS (SELECT CAST(sum(CASE WHEN isA THEN 1 ELSE 0 END)
             |                 AS BIGINT) AS na,
             |               CAST(sum(CASE WHEN isA THEN 0 ELSE 1 END)
             |                 AS BIGINT) AS nb
             |        FROM v),
             |sweep AS (
             |  SELECT CAST(sum(CASE WHEN isA THEN 1 ELSE 0 END)
             |           OVER w AS BIGINT) AS ca,
             |         CAST(sum(CASE WHEN isA THEN 0 ELSE 1 END)
             |           OVER w AS BIGINT) AS cb,
             |         lead(v, 1) OVER (ORDER BY v, doc_id) - v AS gap
             |  FROM v
             |  WINDOW w AS (ORDER BY v, doc_id ROWS UNBOUNDED PRECEDING)),
             |m AS (SELECT na, nb,
             |             sum(CAST(gap AS HUGEINT)
             |                 * (ca * (nb - cb) + cb * (na - ca))) AS sxy,
             |             sum(CAST(gap AS HUGEINT) * (ca * (na - ca)))
             |               AS sxx,
             |             sum(CAST(gap AS HUGEINT) * (cb * (nb - cb)))
             |               AS syy
             |      FROM sweep CROSS JOIN tot
             |      WHERE gap IS NOT NULL GROUP BY 1, 2)
             |SELECT na, nb, CAST(sxy AS BIGINT) AS sum_cross_abs,
             |       round(CAST('2.0' AS DOUBLE) * CAST(sxy AS DOUBLE)
             |         / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
             |       - CAST('2.0' AS DOUBLE) * CAST(sxx AS DOUBLE)
             |         / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE))
             |       - CAST('2.0' AS DOUBLE) * CAST(syy AS DOUBLE)
             |         / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
             |         AS energy
             |FROM m""".stripMargin)),

    // ── Cramér–von Mises: Σ pooled-count · (cA·nB − cB·nA)² on the
    //    distinct value axis, e12-normalized at the end.
    QueryDef("q_cvm_test",
      (s, d) => {
        val dec = "decimal(38,0)"
        val cells = Tables.documents(s, d)
          .select((col("lang") === "en").as("isA"), col("n_chars").as("v"))
          .groupBy(col("v"))
          .agg(sum(when(col("isA"), 1L).otherwise(0L)).as("da"),
            sum(when(!col("isA"), 1L).otherwise(0L)).as("db"))
        val w = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sweep = cells
          .withColumn("ca", sum(col("da")).over(w))
          .withColumn("cb", sum(col("db")).over(w))
          .withColumn("na", sum(col("da")).over(Window.partitionBy()))
          .withColumn("nb", sum(col("db")).over(Window.partitionBy()))
        sweep.agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
            sum(expr(s"CAST((da + db) AS $dec) * " +
              s"CAST(ca * nb - cb * na AS $dec) * " +
              s"CAST(ca * nb - cb * na AS $dec)")).as("num"))
          .selectExpr("na", "nb",
            s"""CAST(num * 1000000 div (CAST(na AS $dec) * CAST(nb AS $dec)
               |* CAST(na AS $dec) * CAST(nb AS $dec)
               |* CAST(na + nb AS $dec)) AS BIGINT) AS cvm_e6"""
              .stripMargin)
      },
      Some("""WITH cells AS (
             |  SELECT n_chars AS v,
             |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             |           AS BIGINT) AS da,
             |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
             |           AS BIGINT) AS db
             |  FROM documents GROUP BY 1),
             |tot AS (SELECT CAST(sum(da) AS BIGINT) AS na,
             |               CAST(sum(db) AS BIGINT) AS nb FROM cells),
             |sweep AS (SELECT da, db,
             |                 CAST(sum(da) OVER w AS BIGINT) AS ca,
             |                 CAST(sum(db) OVER w AS BIGINT) AS cb
             |          FROM cells
             |          WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
             |m AS (SELECT na, nb,
             |             sum(CAST(da + db AS HUGEINT)
             |                 * CAST(ca * nb - cb * na AS HUGEINT)
             |                 * CAST(ca * nb - cb * na AS HUGEINT)) AS num
             |      FROM sweep CROSS JOIN tot GROUP BY 1, 2)
             |SELECT na, nb,
             |       CAST(num * 1000000 // (CAST(na AS HUGEINT)
             |         * CAST(nb AS HUGEINT) * CAST(na AS HUGEINT)
             |         * CAST(nb AS HUGEINT) * CAST(na + nb AS HUGEINT))
             |         AS BIGINT) AS cvm_e6
             |FROM m""".stripMargin))
  )
}
