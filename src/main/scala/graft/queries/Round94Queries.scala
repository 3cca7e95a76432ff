package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Dedup}
import org.apache.spark.sql.functions._

/** Round-94 batch: Holt double-exponential smoothing (the §7.4k item
  * blocked on an oracle formulation — unblocked by the 4^t-scaled
  * all-integer recursion, so NO division happens inside the recursion
  * and the oracle is 11 chained CTEs), and deterministic weighted reservoir sampling (Efraimidis–Spirakis keys
  * on the portable 48-bit hash — the training-data sampling-budget op).
  */
object Round94Queries {

  /** Holt (α=β=½) over x_1..x_12 with l_1=x_1, b_1=0:
    *   l_t = (x_t + l_{t-1} + b_{t-1})/2,  b_t = (l_t − l_{t-1} + b_{t-1})/2.
    * Scaled L_t = l_t·4^{t-1}, B_t = b_t·4^{t-1} the recursion is
    * integer-exact: L_t = x_t·2^{2t-3} + 2L + 2B (even for t≥2), and
    * B_t = L_t/2 − 2L + 2B — every quotient is an exact division of an
    * even number, so trunc (Spark `div`) ≡ floor (DuckDB `//`) with no
    * sign factoring. 4^11 = 4194304 is the final unscale. Headroom:
    * monthly nation revenue ~1e9 cents × 2^21 ≈ 2e15 ≪ Long.MAX — holds
    * to sf100. */
  private val holtScale = 4194304L // 4^11

  def defs: Seq[QueryDef] = Seq(

    // ── Holt level+trend per nation over the 12 months of 1995, h=3
    //    forecast. Spark folds the month vector with one `aggregate`
    //    HOF (linear expression, single pass, per-key — no shuffle past
    //    the pivot); the oracle re-derives the same recursion as 11
    //    chained CTEs — two INDEPENDENT formulations of one identity.
    QueryDef("q_holt_smooth",
      (s, d) => {
        val m = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .where(year(col("o_orderdate")) === 1995)
          .groupBy(col("n_name").as("g"), month(col("o_orderdate")).as("mth"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .as("x"))
        m.groupBy(col("g")).pivot("mth", 1 to 12).agg(first(col("x")))
          .na.fill(0L)
          .withColumn("xs", array((1 to 12).map(i =>
            col(s"`$i`").cast("long")): _*))
          .withColumn("st", expr(
            """aggregate(slice(xs, 2, 11),
              |  named_struct('L', xs[0], 'B', CAST(0 AS BIGINT), 't', 1),
              |  (acc, x) -> named_struct(
              |    'L', x * shiftleft(CAST(1 AS BIGINT), 2 * acc.t - 1)
              |         + 2 * acc.L + 2 * acc.B,
              |    'B', (x * shiftleft(CAST(1 AS BIGINT), 2 * acc.t - 1)
              |          + 2 * acc.L + 2 * acc.B) div 2 - 2 * acc.L + 2 * acc.B,
              |    't', acc.t + 1))""".stripMargin))
          .selectExpr("g AS nation", "st.L AS level_scaled",
            "st.B AS trend_scaled", "st.L + 3 * st.B AS forecast3_scaled",
            s"""CASE WHEN st.L + 3 * st.B >= 0
               |  THEN (st.L + 3 * st.B) div ${holtScale}L
               |  ELSE -((-(st.L + 3 * st.B)) div ${holtScale}L)
               |END AS forecast3_cents""".stripMargin)
      },
      Some {
        val pivots = (1 to 12).map(i =>
          s"coalesce(max(CASE WHEN mth = $i THEN x END), 0) AS x$i")
          .mkString(",\n       ")
        val steps = (2 to 12).map { t =>
          val coef = 1L << (2 * t - 3)
          s"""s$t AS (SELECT g, L, L // 2 - 2 * Lp + 2 * Bp AS B FROM (
             |  SELECT p.g, p.x$t * $coef + 2 * s${t - 1}.L + 2 * s${t - 1}.B AS L,
             |         s${t - 1}.L AS Lp, s${t - 1}.B AS Bp
             |  FROM p JOIN s${t - 1} USING (g)))""".stripMargin
        }.mkString(",\n")
        s"""WITH m AS (
           |  SELECT n_name AS g, month(o_orderdate) AS mth,
           |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |           AS BIGINT) AS x
           |  FROM orders JOIN customer ON o_custkey = c_custkey
           |              JOIN nation ON c_nationkey = n_nationkey
           |  WHERE year(o_orderdate) = 1995
           |  GROUP BY 1, 2),
           |p AS (SELECT g,
           |       $pivots
           |      FROM m GROUP BY 1),
           |s1 AS (SELECT g, CAST(x1 AS BIGINT) AS L, CAST(0 AS BIGINT) AS B
           |       FROM p),
           |$steps
           |SELECT g AS nation, L AS level_scaled, B AS trend_scaled,
           |       L + 3 * B AS forecast3_scaled,
           |       CASE WHEN L + 3 * B >= 0 THEN (L + 3 * B) // $holtScale
           |            ELSE -((-(L + 3 * B)) // $holtScale)
           |       END AS forecast3_cents
           |FROM s12""".stripMargin
      }),

    // ── Deterministic weighted reservoir (Efraimidis–Spirakis): key =
    //    −log₂(u)/w with u = hash48(doc_id)/2^48, all in e6 integers —
    //    keep the bottom-20 keys (≙ the top-20 of u^(1/w)). Longer docs
    //    (more tokens) are proportionally likelier to be kept, and the
    //    whole draw replays bit-identically on any engine — the property
    //    RNG `df.sample` can't give a training-data pipeline. Scale: one
    //    projection + TakeOrdered; no shuffle beyond top-k.
    QueryDef("q_es_reservoir",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("w", greatest(size(split(col("text"), " ")), lit(1))
            .cast("long"))
          .withColumn("h", greatest(
            Dedup.hash48(col("doc_id").cast("string"), lit("wrs")), lit(1L)))
          .withColumn("lg", Bm25.log2E6(col("h")))
          // numerator ≥ 0 (h < 2^48 ⇒ log2E6 ≤ 48e6): trunc ≡ floor.
          .withColumn("key_e6", expr("(48000000L - lg) div w"))
        docs.select(col("doc_id"), col("lang"), col("w"), col("key_e6"))
          .orderBy(col("key_e6").asc, col("doc_id")).limit(20)
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("key_e6").asc, col("doc_id"))))
      },
      Some(s"""WITH d AS (SELECT doc_id, lang,
              |                 greatest(len(string_split(text, ' ')), 1) AS w,
              |                 greatest(${PortableSql.hash48(
                                  "CAST(doc_id AS VARCHAR)", "'wrs'")}, 1) AS h
              |           FROM documents),
              |k AS (SELECT doc_id, lang, CAST(w AS BIGINT) AS w,
              |             (48000000 - ${Bm25.log2E6Sql("h")}) // w AS key_e6
              |      FROM d)
              |SELECT doc_id, lang, w, key_e6,
              |       CAST(row_number() OVER (ORDER BY key_e6, doc_id)
              |         AS BIGINT) AS rank
              |FROM k ORDER BY key_e6, doc_id LIMIT 20""".stripMargin))
  )
}
