package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Round-156 batch:
  *
  *  - G/G/1 queue waits (`q_queue_waits`): per priority class, treat
  *    orders as arrivals and price-proportional service times; the
  *    Lindley recursion W_n = max(0, W_{n−1} + s_{n−1} − a_n) closes
  *    over prefix sums via the reflection identity (the
  *    q_clamped_balance trick re-aimed at waiting time), so mean/max/
  *    exact-p95 wait per class costs two windows and a rank — no fold.
  *  - K-means inertia curve (`q_kmeans_inertia_curve`): two full
  *    Lloyd's rounds from the first-8-vector seed; per round, the
  *    rounded-cosine inertia and the number of vectors that changed
  *    cluster — the convergence trace behind q_kmeans_round's single
  *    step. Centroids round to 4 dp (engine-portable means), distances
  *    to 6 dp, inertia sums exact integers after e6 scaling.
  */
object Round156Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Lindley waits per priority. d_n = s_{n−1} − a_n over arrival
    //    order (ties → orderkey); W = S − min(0, running-min S).
    //    Service = totalprice dollars (seconds, arbitrary unit);
    //    arrival gaps in seconds. First order per class waits 0.
    QueryDef("q_queue_waits",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byP = Window.partitionBy(col("pr"))
          .orderBy(col("t"), col("ok"))
        val cum = byP.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        val base = Tables.orders(s, d)
          .select(col("o_orderpriority").as("pr"),
            col("o_orderkey").as("ok"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 1000000")
              .as("t"),
            expr("CAST(floor(o_totalprice) AS BIGINT)").as("svc"))
          .withColumn("a", col("t") - lag(col("t"), 1).over(byP))
          .withColumn("sprev", lag(col("svc"), 1).over(byP))
          .withColumn("dd",
            when(col("a").isNull, lit(0L))
              .otherwise(col("sprev") - col("a")))
          .withColumn("run", sum(col("dd")).over(cum))
          .withColumn("w",
            col("run") - least(lit(0L), min(col("run")).over(cum)))
          .localCheckpoint(false)
        val ranked = base.withColumn("rk", row_number().over(
          Window.partitionBy(col("pr")).orderBy(col("w"), col("t"),
            col("ok"))))
        val stats = base.groupBy(col("pr"))
          .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"),
            max(col("w")).as("max_wait_s"))
        ranked.join(stats, "pr")
          .filter(col("rk") === expr("(95 * n + 99) div 100"))
          .selectExpr("pr AS priority", "CAST(n AS BIGINT) AS n_jobs",
            "sw div n AS mean_wait_s", "w AS p95_wait_s", "max_wait_s")
      },
      Some("""WITH base AS (
             |  SELECT o_orderpriority AS pr, o_orderkey AS ok,
             |         epoch_us(o_orderdate) // 1000000 AS t,
             |         CAST(floor(o_totalprice) AS BIGINT) AS svc
             |  FROM orders),
             |lagd AS (SELECT pr, ok, t, svc,
             |           t - lag(t) OVER w AS a,
             |           lag(svc) OVER w AS sprev
             |         FROM base WINDOW w AS (PARTITION BY pr
             |           ORDER BY t, ok)),
             |dd AS (SELECT pr, ok, t,
             |         CASE WHEN a IS NULL THEN 0 ELSE sprev - a END AS dd
             |       FROM lagd),
             |r AS (SELECT pr, ok, t,
             |        CAST(sum(dd) OVER w AS BIGINT) AS run
             |      FROM dd WINDOW w AS (PARTITION BY pr ORDER BY t, ok
             |        ROWS UNBOUNDED PRECEDING)),
             |wt AS (SELECT pr, ok, t,
             |         run - least(0, CAST(min(run) OVER w AS BIGINT))
             |           AS w
             |       FROM r WINDOW w AS (PARTITION BY pr ORDER BY t, ok
             |         ROWS UNBOUNDED PRECEDING)),
             |rk AS (SELECT pr, w,
             |         CAST(row_number() OVER (PARTITION BY pr
             |           ORDER BY w, t, ok) AS BIGINT) AS rk
             |       FROM wt),
             |st AS (SELECT pr, CAST(count(*) AS BIGINT) AS n,
             |              CAST(sum(w) AS BIGINT) AS sw,
             |              CAST(max(w) AS BIGINT) AS max_wait_s
             |       FROM wt GROUP BY 1)
             |SELECT rk.pr AS priority, st.n AS n_jobs,
             |       st.sw // st.n AS mean_wait_s,
             |       rk.w AS p95_wait_s, st.max_wait_s
             |FROM rk JOIN st ON rk.pr = st.pr
             |WHERE rk.rk = (95 * st.n + 99) // 100""".stripMargin)),

    // ── Two Lloyd's rounds with per-round inertia (Σ rounded
    //    (1−cos)·1e6) and moved-vector counts vs the previous
    //    assignment. Centroid means at 4 dp keep the whole trace
    //    engine-portable.
    QueryDef("q_kmeans_inertia_curve",
      (s, d) => {
        val e = Similarity.cast(Tables.embeddings(s, d))
          .select(col("vec_id"), col("ev")).localCheckpoint(false)
        val c0 = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("ev").as("cv"))

        // rank by RAW cosine (the ivfAssign convention — IEEE-identical
        // expression text both engines); round only the kept value
        def assignWithCos(cents: org.apache.spark.sql.DataFrame) = {
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy(col("vec_id"))
            .orderBy(col("rawc").desc, col("c_id"))
          e.crossJoin(broadcast(cents))
            .withColumn("rawc", Similarity.cosine(col("ev"), col("cv")))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .select(col("vec_id"), col("ev"), col("c_id"),
              round(col("rawc"), 6).as("ccos"))
            .localCheckpoint(false)
        }
        val a0 = assignWithCos(c0)
        val c1 = Similarity.kmeansRecompute(
          a0.select(col("vec_id"), col("ev"), col("c_id")))
          .localCheckpoint(false)
        val a1 = assignWithCos(c1)
        val c2 = Similarity.kmeansRecompute(
          a1.select(col("vec_id"), col("ev"), col("c_id")))
          .localCheckpoint(false)
        val a2 = assignWithCos(c2)

        def inertia(a: org.apache.spark.sql.DataFrame, r: Int) = a
          .selectExpr("CAST(round((1 - ccos) * 1000000) AS BIGINT) AS i")
          .agg(sum(col("i")).as("inertia_e6"))
          .selectExpr(s"CAST($r AS BIGINT) AS round", "inertia_e6")
        def moved(prev: org.apache.spark.sql.DataFrame,
                  cur: org.apache.spark.sql.DataFrame) = prev
          .select(col("vec_id"), col("c_id").as("p"))
          .join(cur.select(col("vec_id"), col("c_id").as("c")), "vec_id")
          .agg(sum(when(col("p") =!= col("c"), 1L).otherwise(0L))
            .as("n_moved"))

        val r0 = inertia(a0, 0).crossJoin(broadcast(
          s.range(1).selectExpr("CAST(0 AS BIGINT) AS n_moved")))
        val r1 = inertia(a1, 1).crossJoin(broadcast(moved(a0, a1)))
        val r2 = inertia(a2, 2).crossJoin(broadcast(moved(a1, a2)))
        r0.unionByName(r1).unionByName(r2)
          .selectExpr("round", "inertia_e6",
            "CAST(n_moved AS BIGINT) AS n_moved")
      },
      Some {
        val cos = (a: String, b: String) =>
          s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
        def assign(cents: String, out: String) =
          s"""$out AS (SELECT vec_id, ev, c_id,
             |  round(${cos("ev", "cv")}, 6) AS ccos FROM (
             |  SELECT e.vec_id, e.ev, c.c_id, c.cv,
             |         row_number() OVER (PARTITION BY e.vec_id
             |           ORDER BY ${cos("e.ev", "c.cv")} DESC,
             |           c.c_id ASC) AS rn
             |  FROM e CROSS JOIN $cents c) t WHERE rn = 1)""".stripMargin
        def recompute(asn: String, out: String) =
          s"""$out AS (
             |  SELECT c_id, list(c ORDER BY i) AS cv FROM (
             |    SELECT c_id, i, round(avg(v), 4) AS c
             |    FROM (SELECT c_id, generate_subscripts(ev, 1) AS i,
             |                 unnest(ev) AS v
             |          FROM $asn) x
             |    GROUP BY 1, 2) g GROUP BY 1)""".stripMargin
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
           |           FROM embeddings),
           |c0 AS (SELECT vec_id AS c_id, ev AS cv FROM e
           |       WHERE vec_id < 8),
           |${assign("c0", "a0")},
           |${recompute("a0", "c1")},
           |${assign("c1", "a1")},
           |${recompute("a1", "c2")},
           |${assign("c2", "a2")},
           |i0 AS (SELECT CAST(0 AS BIGINT) AS round,
           |         CAST(sum(CAST(round((1 - ccos) * 1000000) AS BIGINT))
           |           AS BIGINT) AS inertia_e6,
           |         CAST(0 AS BIGINT) AS n_moved FROM a0),
           |i1 AS (SELECT CAST(1 AS BIGINT),
           |         CAST(sum(CAST(round((1 - ccos) * 1000000) AS BIGINT))
           |           AS BIGINT),
           |         (SELECT CAST(sum(CASE WHEN p.c_id <> c.c_id THEN 1
           |            ELSE 0 END) AS BIGINT)
           |          FROM a0 p JOIN a1 c ON p.vec_id = c.vec_id)
           |       FROM a1),
           |i2 AS (SELECT CAST(2 AS BIGINT),
           |         CAST(sum(CAST(round((1 - ccos) * 1000000) AS BIGINT))
           |           AS BIGINT),
           |         (SELECT CAST(sum(CASE WHEN p.c_id <> c.c_id THEN 1
           |            ELSE 0 END) AS BIGINT)
           |          FROM a1 p JOIN a2 c ON p.vec_id = c.vec_id)
           |       FROM a2)
           |SELECT * FROM i0 UNION ALL SELECT * FROM i1
           |UNION ALL SELECT * FROM i2""".stripMargin
      })
  )
}
