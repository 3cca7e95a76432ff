package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-84 batch: discounted cohort LTV (net-present value of the
  * q_cohort_ltv curve via literal dyadic discount coefficients —
  * identical constants compiled into both engines), MOSS winnowing
  * fingerprints (the window-min k-gram selection guaranteeing matches
  * of length ≥ w+k−1 are caught — the robust-fingerprint rung above
  * q_dedup_minhash's random sample), and Chapman capture–recapture
  * (population estimates from two observation windows vs the true
  * distinct count — the ecology estimator that audits incomplete
  * logging).
  */
object Round84Queries {

  /** floor(1e6 · (100/105)^k), k = 0..24 — 5%/month discount, computed
    * once here and embedded as literals in BOTH plans. */
  private val dcf: Seq[Long] = {
    var v = BigInt(1000000)
    (0 to 24).map { _ =>
      val cur = v.toLong
      v = v * 100 / 105
      cur
    }
  }

  private def dcfCase(ageCol: String): String =
    "CASE " + dcf.zipWithIndex.map { case (v, k) =>
      s"WHEN $ageCol = $k THEN $v"
    }.mkString(" ") + " ELSE 0 END"

  def defs: Seq[QueryDef] = Seq(

    // ── Discounted LTV: cohort revenue at age k weighted by the
    //    literal (100/105)^k table, ages beyond 24 months cut off.
    QueryDef("q_discounted_ltv",
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_custkey").as("ck"),
          expr("year(o_orderdate) * 12 + month(o_orderdate)").as("m"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        val coh = o.groupBy(col("ck")).agg(min(col("m")).as("cohort"))
        o.join(coh, "ck")
          .withColumn("age", col("m") - col("cohort"))
          .where(col("age") <= 24)
          .withColumn("w_e6", expr(dcfCase("age")))
          .groupBy(col("cohort"))
          .agg(countDistinct(col("ck")).as("n_custs"),
            sum(col("cents")).as("rev_cents"),
            sum(expr("cents * w_e6")).as("npv_num"))
          .selectExpr("cohort", "n_custs", "rev_cents",
            "npv_num div 1000000 AS npv_cents",
            "npv_num div 1000000 div n_custs AS npv_per_cust_cents")
      },
      Some(s"""WITH o AS (
              |  SELECT o_custkey AS ck,
              |         year(o_orderdate) * 12 + month(o_orderdate) AS m,
              |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
              |           AS cents
              |  FROM orders),
              |coh AS (SELECT ck, min(m) AS cohort FROM o GROUP BY 1),
              |w AS (SELECT o.ck, cohort, cents, m - cohort AS age
              |      FROM o JOIN coh ON o.ck = coh.ck
              |      WHERE m - cohort <= 24),
              |ww AS (SELECT ck, cohort, cents,
              |              ${dcfCase("age")} AS w_e6
              |       FROM w)
              |SELECT cohort, CAST(count(DISTINCT ck) AS BIGINT) AS n_custs,
              |       CAST(sum(cents) AS BIGINT) AS rev_cents,
              |       CAST(sum(cents * w_e6) // 1000000 AS BIGINT)
              |         AS npv_cents,
              |       CAST(sum(cents * w_e6) // 1000000
              |         // count(DISTINCT ck) AS BIGINT)
              |         AS npv_per_cust_cents
              |FROM ww GROUP BY 1""".stripMargin)),

    // ── Winnowing (w = 4, k = 5): per doc the selected fingerprint
    //    density vs the 2/(w+1) theory. Rightmost-min selection.
    QueryDef("q_winnowing",
      (s, d) => {
        val grams = Tables.documents(s, d).where(col("doc_id") < 200)
          .select(col("doc_id"),
            explode(expr(
              "transform(sequence(1, greatest(length(text) - 4, 1)), " +
                "i -> struct(i AS pos, substring(text, i, 5) AS g))"))
              .as("t"))
          .select(col("doc_id"), col("t.pos").as("pos"),
            Dedup.hash48(col("t.g"), lit("win")).as("h"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(-3, 0)
        val sel = grams
          .withColumn("wmin", min(col("h")).over(w))
          .withColumn("rw", max(when(col("h") === col("wmin"), col("pos")))
            .over(w))
          .where(col("pos") === col("rw"))
          .select(col("doc_id"), col("rw")).distinct()
        grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
          .join(sel.groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_fingerprints")), "doc_id")
          .withColumn("density_e6",
            expr("n_fingerprints * 1000000 div n_grams"))
      },
      Some {
        val h = PortableSql.hash48("g", "'win'")
        s"""WITH grams AS MATERIALIZED (
           |  SELECT doc_id, pos, $h AS h FROM (
           |    SELECT doc_id,
           |           unnest(generate_series(1,
           |             greatest(length(text) - 4, 1))) AS pos,
           |           unnest(list_transform(generate_series(1,
           |             greatest(length(text) - 4, 1)),
           |             i -> substr(text, i, 5))) AS g
           |    FROM documents WHERE doc_id < 200)),
           |wnd1 AS (SELECT doc_id, pos, h,
           |                min(h) OVER w AS wmin
           |         FROM grams
           |         WINDOW w AS (PARTITION BY doc_id ORDER BY pos
           |                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)),
           |wnd AS (SELECT doc_id, pos,
           |               max(CASE WHEN h = wmin THEN pos END)
           |                 OVER w AS rw
           |        FROM wnd1
           |        WINDOW w AS (PARTITION BY doc_id ORDER BY pos
           |                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)),
           |sel AS (SELECT DISTINCT doc_id, rw FROM wnd
           |        WHERE pos = rw),
           |ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
           |       FROM grams GROUP BY 1),
           |nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints
           |       FROM sel GROUP BY 1)
           |SELECT ng.doc_id, n_grams, n_fingerprints,
           |       n_fingerprints * 1000000 // n_grams AS density_e6
           |FROM ng JOIN nf ON ng.doc_id = nf.doc_id""".stripMargin
      }),

    // ── Chapman capture–recapture per event type: first vs second half
    //    of the time range as the two capture occasions.
    QueryDef("q_capture_recapture",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type").as("et"), col("user_id").as("u"),
            expr("unix_micros(ts)").as("t"))
        val mid = ev.agg(expr("(min(t) + max(t)) div 2").as("mid"))
        // ONE (et, u) collapse carries both occasion flags — n1/n2/m/true
        // then fall out of a single per-type rollup (2 exchanges total,
        // vs 4 distinct+join passes over the raw scan).
        ev.crossJoin(broadcast(mid))
          .groupBy(col("et"), col("u"))
          .agg(max(when(col("t") < col("mid"), 1L).otherwise(0L)).as("in1"),
            max(when(col("t") >= col("mid"), 1L).otherwise(0L)).as("in2"))
          .groupBy(col("et"))
          .agg(sum(col("in1")).as("n1"), sum(col("in2")).as("n2"),
            sum(col("in1") * col("in2")).as("m_both"),
            count(lit(1)).as("n_true"))
          .selectExpr("et", "n1", "n2", "m_both", "n_true",
            "(n1 + 1) * (n2 + 1) div (m_both + 1) - 1 AS n_chapman")
      },
      Some("""WITH ev AS (SELECT event_type AS et, user_id AS u,
             |                  epoch_us(ts) AS t FROM events),
             |mid AS (SELECT (min(t) + max(t)) // 2 AS mid
             |        FROM ev),
             |tagged AS (SELECT et, u, t < mid AS h1
             |           FROM ev CROSS JOIN mid),
             |s1 AS (SELECT DISTINCT et, u FROM tagged WHERE h1),
             |s2 AS (SELECT DISTINCT et, u FROM tagged WHERE NOT h1),
             |m AS (SELECT s1.et, CAST(count(*) AS BIGINT) AS m_both
             |      FROM s1 JOIN s2 ON s1.et = s2.et AND s1.u = s2.u
             |      GROUP BY 1),
             |c1 AS (SELECT et, CAST(count(*) AS BIGINT) AS n1
             |       FROM s1 GROUP BY 1),
             |c2 AS (SELECT et, CAST(count(*) AS BIGINT) AS n2
             |       FROM s2 GROUP BY 1),
             |tr AS (SELECT et, CAST(count(DISTINCT u) AS BIGINT) AS n_true
             |       FROM tagged GROUP BY 1)
             |SELECT c1.et, n1, n2, m_both, n_true,
             |       (n1 + 1) * (n2 + 1) // (m_both + 1) - 1 AS n_chapman
             |FROM c1 JOIN c2 ON c1.et = c2.et
             |     JOIN m ON c1.et = m.et JOIN tr ON c1.et = tr.et"""
        .stripMargin))
  )
}
