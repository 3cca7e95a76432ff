package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-64 batch: cohort LTV curves (cumulative revenue by signup
  * cohort and age — the monetary companion to q_cohort_retention),
  * deterministic negative sampling (hash-generated non-interacted
  * candidates anti-joined against positives — the contrastive-training
  * data op), and a curriculum-learning schedule audit (documents
  * ordered by a difficulty blend, decile profile).
  */
object Round64Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Cohort LTV: cohort = first-order month, age in months, revenue
    //    accumulated along each cohort's age axis (calendar-bounded).
    QueryDef("q_cohort_ltv",
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_custkey").as("ck"),
          expr("year(o_orderdate) * 12 + month(o_orderdate)").as("m"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        val coh = o.groupBy(col("ck")).agg(min(col("m")).as("cohort"))
        val cell = o.join(coh, "ck")
          .groupBy(col("cohort"), (col("m") - col("cohort")).as("age"))
          .agg(countDistinct(col("ck")).as("n_active"),
            sum(col("cents")).as("rev_cents"))
        cell.withColumn("cum_rev_cents", sum(col("rev_cents")).over(
          Window.partitionBy(col("cohort")).orderBy(col("age"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      },
      Some("""WITH o AS (
             |  SELECT o_custkey AS ck,
             |         year(o_orderdate) * 12 + month(o_orderdate) AS m,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders),
             |coh AS (SELECT ck, min(m) AS cohort FROM o GROUP BY 1),
             |cell AS (
             |  SELECT cohort, m - cohort AS age,
             |         CAST(count(DISTINCT o.ck) AS BIGINT) AS n_active,
             |         CAST(sum(cents) AS BIGINT) AS rev_cents
             |  FROM o JOIN coh ON o.ck = coh.ck GROUP BY 1, 2)
             |SELECT cohort, age, n_active, rev_cents,
             |       CAST(sum(rev_cents) OVER (PARTITION BY cohort
             |         ORDER BY age ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |         AS cum_rev_cents
             |FROM cell""".stripMargin)),

    // ── Negative sampling: 8 hash candidates per user, anti-joined
    //    against the positive set, first 4 survivors kept (j order).
    QueryDef("q_negative_sampling",
      (s, d) => {
        val pos = Tables.events(s, d)
          .select(col("user_id").as("u"), (col("event_id") % 200).as("item"))
          .distinct()
          .localCheckpoint(false) // reused: per-user counts + anti-join
        val nPos = pos.groupBy(col("u")).agg(count(lit(1)).as("n_pos"))
        val cand = nPos.select(col("u"))
          .withColumn("j", explode(expr("sequence(1, 8)")))
          .withColumn("item", expr("(u * 31 + j * 17) % 200"))
        val neg = cand.join(pos, Seq("u", "item"), "left_anti")
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("u")).orderBy(col("j"))))
          .where(col("rk") <= 4)
          .groupBy(col("u"))
          .agg(count(lit(1)).as("n_neg"), sum(col("item")).as("neg_sum"),
            min(col("item")).as("neg_min"), max(col("item")).as("neg_max"))
        nPos.join(neg, Seq("u"), "left")
          .selectExpr("u", "n_pos",
            "coalesce(n_neg, CAST(0 AS BIGINT)) AS n_neg",
            "coalesce(neg_sum, CAST(0 AS BIGINT)) AS neg_sum",
            "coalesce(neg_min, CAST(-1 AS BIGINT)) AS neg_min",
            "coalesce(neg_max, CAST(-1 AS BIGINT)) AS neg_max")
      },
      Some("""WITH pos AS (SELECT DISTINCT user_id AS u,
             |                    event_id % 200 AS item FROM events),
             |np AS (SELECT u, CAST(count(*) AS BIGINT) AS n_pos
             |       FROM pos GROUP BY 1),
             |cand AS (SELECT u, j, (u * 31 + j * 17) % 200 AS item
             |         FROM np, unnest(generate_series(1, 8)) AS t(j)),
             |surv AS (SELECT cand.u, cand.j, cand.item,
             |                row_number() OVER (PARTITION BY cand.u
             |                  ORDER BY cand.j) AS rk
             |         FROM cand ANTI JOIN pos
             |           ON cand.u = pos.u AND cand.item = pos.item),
             |neg AS (SELECT u, CAST(count(*) AS BIGINT) AS n_neg,
             |               CAST(sum(item) AS BIGINT) AS neg_sum,
             |               CAST(min(item) AS BIGINT) AS neg_min,
             |               CAST(max(item) AS BIGINT) AS neg_max
             |        FROM surv WHERE rk <= 4 GROUP BY 1)
             |SELECT np.u, n_pos, coalesce(n_neg, 0) AS n_neg,
             |       coalesce(neg_sum, 0) AS neg_sum,
             |       coalesce(neg_min, -1) AS neg_min,
             |       coalesce(neg_max, -1) AS neg_max
             |FROM np LEFT JOIN neg ON np.u = neg.u""".stripMargin)),

    // ── Curriculum schedule: difficulty = token count + inverted
    //    type-token ratio; decile profile of the resulting order.
    QueryDef("q_curriculum_order",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .select(col("doc_id"),
            expr("size(filter(ws, w -> w <> ''))").cast("long").as("toks"),
            expr("size(array_distinct(filter(ws, w -> w <> '')))")
              .cast("long").as("uniq"))
          .where(col("toks") > 0)
          .withColumn("ttr_e6", expr("uniq * 1000000 div toks"))
          .withColumn("difficulty_e6",
            expr("toks * 1000 + (1000000 - ttr_e6)"))
          // checkpoint the tokenize pass (split + array_distinct over
          // every doc — the dominant cost) so BOTH consumers below ride
          // one materialization; before r10 the rank layout and the
          // count each re-tokenized the corpus (the r9 0.42→1.10 s
          // regression the VERDICT flagged)
          .localCheckpoint(false)
        // ntile from the distributed global rank (see q_ntile_buckets):
        // same buckets, no single-partition sort of the corpus.
        val ranked = graft.ops.Ranks.globalRowNumber(docs,
          Seq(col("difficulty_e6").asc, col("doc_id").asc), "r")
        // count from the BASE frame, not `ranked` — the latter would
        // re-plan the rank subtree under the broadcast
        val tot = docs.agg(count(lit(1)).as("nt"))
        ranked.crossJoin(broadcast(tot))
          .withColumn("decile", expr(
            """CASE WHEN r <= (nt % 10) * (nt div 10 + 1)
              |     THEN (r - 1) div (nt div 10 + 1) + 1
              |     ELSE (nt % 10) +
              |          (r - (nt % 10) * (nt div 10 + 1) - 1) div (nt div 10) + 1
              |END""".stripMargin).cast("long"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("difficulty_e6")).as("min_diff_e6"),
            max(col("difficulty_e6")).as("max_diff_e6"),
            expr("sum(toks) div count(1)").as("mean_toks"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, wd FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS wd
             |    FROM documents) u
             |  WHERE wd <> ''),
             |docs AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS toks,
             |         CAST(count(DISTINCT wd) AS BIGINT) AS uniq
             |  FROM w GROUP BY 1),
             |sc AS (SELECT doc_id, toks,
             |              toks * 1000 + (1000000 - uniq * 1000000 // toks)
             |                AS difficulty_e6
             |       FROM docs WHERE toks > 0),
             |t AS (SELECT *, CAST(ntile(10) OVER (ORDER BY difficulty_e6,
             |        doc_id) AS BIGINT) AS decile FROM sc)
             |SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(min(difficulty_e6) AS BIGINT) AS min_diff_e6,
             |       CAST(max(difficulty_e6) AS BIGINT) AS max_diff_e6,
             |       CAST(sum(toks) // count(*) AS BIGINT) AS mean_toks
             |FROM t GROUP BY 1""".stripMargin))
  )
}
