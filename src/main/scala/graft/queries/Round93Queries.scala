package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-93 batch: the two stream-op batch twins the r8 parity sweep
  * found missing (first-per-key for [[graft.stream.StreamDedup]], the
  * Misra–Gries guarantee set for [[graft.stream.StreamTopK]]) and the
  * DDSketch accuracy audit (§7.4k cheap win): landing-bucket
  * reconstructed percentiles vs the exact selection percentiles, with
  * the relative-error bound the sketch advertises made checkable.
  */
object Round93Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── StreamDedup.firstPerKey batch twin: deterministic FIRST event
    //    per user (argmin by event time, event_id tiebreak) — one keyed
    //    aggregate with map-side combine; the struct-min is the same
    //    argmax trick as q_latest_maxby, flipped. Streaming keeps one
    //    row per key in the state store; batch reduces to it exactly.
    QueryDef("q_first_per_key",
      (s, d) => Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("event_id"), col("event_type"))
        .groupBy(col("user_id"))
        .agg(min(struct(col("t_us"), col("event_id"), col("event_type")))
          .as("f"))
        .select(col("user_id"), col("f.t_us").as("first_t_us"),
          col("f.event_id").as("first_event_id"),
          col("f.event_type").as("first_event_type")),
      Some("""SELECT user_id, t_us AS first_t_us,
             |       event_id AS first_event_id,
             |       event_type AS first_event_type
             |FROM (SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type,
             |             row_number() OVER (PARTITION BY user_id
             |               ORDER BY epoch_us(ts), event_id) AS rn
             |      FROM events)
             |WHERE rn = 1""".stripMargin)),

    // ── StreamTopK (Misra–Gries) batch twin: the exact per-key top-5
    //    heavy hitters with the MG capacity-7 GUARANTEE flag — a value
    //    is guaranteed tracked by the stream summary iff
    //    cnt·(capacity+1) > N(key). The stream emits under-estimates of
    //    exactly these counts; this is the ground truth it approximates.
    //    Scale: two keyed aggregates + a top-k window per key — no
    //    all-values state anywhere.
    QueryDef("q_mg_guarantee",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_type").as("k"), (col("user_id") % 50).as("v"))
        val cnt = e.groupBy(col("k"), col("v")).agg(count(lit(1)).as("cnt"))
        val tot = cnt.groupBy(col("k")).agg(sum(col("cnt")).as("n"))
        cnt.join(tot, "k")
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("k"))
              .orderBy(col("cnt").desc, col("v"))))
          .where(col("rk") <= 5)
          .select(col("k").as("key"), col("v").as("value"),
            col("cnt"), col("n"), col("rk"),
            (col("cnt") * 8 > col("n")).as("mg_guaranteed"))
      },
      Some("""WITH c AS (SELECT event_type AS k, user_id % 50 AS v,
             |                  CAST(count(*) AS BIGINT) AS cnt
             |           FROM events GROUP BY 1, 2),
             |t AS (SELECT k, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1)
             |SELECT k AS key, v AS value, cnt, n, rk,
             |       cnt * 8 > n AS mg_guaranteed
             |FROM (SELECT c.k, c.v, c.cnt, t.n,
             |             CAST(row_number() OVER (PARTITION BY c.k
             |               ORDER BY c.cnt DESC, c.v) AS BIGINT) AS rk
             |      FROM c JOIN t ON c.k = t.k)
             |WHERE rk <= 5""".stripMargin)),

    // ── DDSketch accuracy audit (§7.4k): the landing-bucket percentile
    //    RECONSTRUCTION (geometric bucket midpoint, fixed-point 2^x)
    //    joined against the exact selection percentile per (group, p).
    //    Bucket width 0.057536 in log₂ → worst-case midpoint error
    //    2^(w/2) − 1 ≈ 2.01%; within_bound pins ≤2.5% (headroom for the
    //    e6 log/pow table rounding). One join over GROUPS×PERCENTILES
    //    rows — the audit costs nothing at any scale.
    QueryDef("q_ddsketch_accuracy",
      (s, d) => {
        val e = Tables.events(s, d).select(col("event_type").as("g"),
          greatest(floor(col("value") * 100 + 0.5).cast("long"), lit(1L))
            .as("cents"))
        val est = graft.ops.Sketches.logBucketQuantile(
            e.select(col("g"), col("cents")), "g", "cents", 57536L,
            Seq(500000L, 990000L))
          .withColumn("mid_l", expr("bucket * 57536L + 28768L"))
          .withColumn("est_cents", graft.ops.Sketches.pow2E6Expr("mid_l"))
          .select(col("g"), col("p_e6"), col("est_cents"))
        // Exact percentile via the per-group distinct-value cell axis
        // (cum counts select the same value a positional sort would) —
        // the windows walk value cells, not raw rows.
        val cells = e.groupBy(col("g"), col("cents"))
          .agg(count(lit(1)).as("c"))
        val byg = Window.partitionBy(col("g"))
        val r = cells
          .withColumn("cum", sum(col("c")).over(byg.orderBy(col("cents"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", sum(col("c")).over(byg))
        val exact = Seq(500000L, 990000L).map(p =>
          r.where(col("cum") >= expr(s"(n * ${p}L + 999999L) div 1000000L") &&
              col("cum") - col("c") <
                expr(s"(n * ${p}L + 999999L) div 1000000L"))
            .select(col("g"), lit(p).as("p_e6"),
              col("cents").as("exact_cents"))).reduce(_ unionByName _)
        est.join(exact, Seq("g", "p_e6"))
          .withColumn("rel_err_e6", expr(
            "abs(est_cents - exact_cents) * 1000000L div exact_cents"))
          .withColumn("within_bound", col("rel_err_e6") <= 25000L)
      },
      Some {
        val lg = Bm25.log2E6Sql("cents")
        val estE = graft.ops.Sketches.pow2E6Sql("bucket * 57536 + 28768")
        s"""WITH e AS (SELECT event_type AS g,
           |                 greatest(1, CAST(floor(value * 100 + 0.5)
           |                   AS BIGINT)) AS cents
           |           FROM events),
           |b AS (SELECT g, $lg // 57536 AS bucket FROM e),
           |c AS (SELECT g, bucket, CAST(count(*) AS BIGINT) AS cnt
           |      FROM b GROUP BY 1, 2),
           |w AS (SELECT g, bucket, cnt,
           |             CAST(sum(cnt) OVER (PARTITION BY g ORDER BY bucket)
           |               AS BIGINT) AS cum,
           |             CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
           |      FROM c),
           |ps AS (SELECT unnest([500000, 990000]) AS p_e6),
           |est AS (SELECT g, CAST(ps.p_e6 AS BIGINT) AS p_e6,
           |               CAST($estE AS BIGINT) AS est_cents
           |        FROM w JOIN ps ON cum >= (n * ps.p_e6 + 999999) // 1000000
           |                      AND cum - cnt < (n * ps.p_e6 + 999999) // 1000000),
           |r AS (SELECT g, cents,
           |             row_number() OVER (PARTITION BY g ORDER BY cents) AS rn,
           |             count(*) OVER (PARTITION BY g) AS n
           |      FROM e),
           |exact AS (SELECT g, CAST(ps.p_e6 AS BIGINT) AS p_e6,
           |                 cents AS exact_cents
           |          FROM r JOIN ps ON rn = (n * ps.p_e6 + 999999) // 1000000)
           |SELECT est.g, est.p_e6, est.est_cents, exact.exact_cents,
           |       abs(est.est_cents - exact.exact_cents) * 1000000
           |         // exact.exact_cents AS rel_err_e6,
           |       abs(est.est_cents - exact.exact_cents) * 1000000
           |         // exact.exact_cents <= 25000 AS within_bound
           |FROM est JOIN exact ON est.g = exact.g AND est.p_e6 = exact.p_e6""".stripMargin
      })
  )
}
