package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-81 batch, embedding-corpus QA: SMOTE-style midpoint synthesis
  * for the minority class (the oversampling data op — deterministic
  * nearest-neighbor interpolation), out-of-distribution margins
  * (own-centroid vs nearest-other-centroid distance — the label-noise
  * flag q_lof's density score can't attribute), and embedding isotropy
  * (top-eigenvalue share of total variance — how collapsed the space
  * is, the one-number summary over q_pca_power/q_pca_deflation).
  */
object Round81Queries {

  private def qvec(emb: org.apache.spark.sql.DataFrame) =
    emb.select(col("vec_id").cast("long").as("vec_id"),
      col("label").cast("long").as("label"),
      expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
        "x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))").as("qv"))

  private val qvecSql =
    """q AS MATERIALIZED (
      |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
      |         CAST(label AS BIGINT) AS label,
      |         list_transform(CAST(embedding AS DOUBLE[]),
      |           x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
      |  FROM embeddings)""".stripMargin

  private def d2Sql(a: String, b: String) =
    s"""CAST(list_sum(list_transform(generate_series(1, len($a)),
       |  i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── SMOTE midpoints: minority class (smallest, tie → lowest id),
    //    each point paired with its nearest same-class neighbor,
    //    synthetic = per-dim truncated midpoint.
    QueryDef("q_smote_midpoints",
      (s, d) => {
        val q = qvec(Tables.embeddings(s, d)).localCheckpoint(false)
        val minority = q.groupBy(col("label"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("n"), col("label"))))
          .where(col("rk") === 1).select(col("label"))
        val m = q.join(broadcast(minority), "label")
        val b = m.select(col("vec_id").as("ib"), col("qv").as("bv"))
        m.join(b, col("vec_id") =!= col("ib"))
          .select(col("label"), col("vec_id"), col("ib"),
            expr("""aggregate(zip_with(qv, bv, (x, y) -> (x - y) * (x - y)),
                   |0L, (acc, v) -> acc + v)""".stripMargin).as("d2"),
            expr("""aggregate(zip_with(qv, bv, (x, y) ->
                   |(CASE WHEN x + y >= 0 THEN (x + y) div 2
                   |      ELSE -((-(x + y)) div 2) END) *
                   |(CASE WHEN x + y >= 0 THEN (x + y) div 2
                   |      ELSE -((-(x + y)) div 2) END)),
                   |0L, (acc, v) -> acc + v)""".stripMargin).as("mid_norm2"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("ib"))))
          .where(col("rk") === 1)
          .select(col("label"), col("vec_id"), col("ib").as("nn_id"),
            col("d2").as("d2_pair"), col("mid_norm2"))
      },
      Some(s"""WITH $qvecSql,
              |minority AS (SELECT label FROM (
              |  SELECT label, count(*) AS n,
              |         row_number() OVER (ORDER BY count(*), label) AS rk
              |  FROM q GROUP BY 1) WHERE rk = 1),
              |m AS (SELECT q.* FROM q JOIN minority USING (label)),
              |pairs AS (
              |  SELECT a.label, a.vec_id, b.vec_id AS ib,
              |         ${d2Sql("a.qv", "b.qv")} AS d2,
              |         CAST(list_sum(list_transform(
              |           generate_series(1, len(a.qv)),
              |           i -> (CASE WHEN a.qv[i] + b.qv[i] >= 0
              |                 THEN (a.qv[i] + b.qv[i]) // 2
              |                 ELSE -((-(a.qv[i] + b.qv[i])) // 2) END)
              |                * (CASE WHEN a.qv[i] + b.qv[i] >= 0
              |                   THEN (a.qv[i] + b.qv[i]) // 2
              |                   ELSE -((-(a.qv[i] + b.qv[i])) // 2) END)))
              |           AS BIGINT) AS mid_norm2
              |  FROM m a JOIN m b ON a.vec_id <> b.vec_id)
              |SELECT label, vec_id, ib AS nn_id, d2 AS d2_pair, mid_norm2
              |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
              |        ORDER BY d2, ib) AS rk FROM pairs)
              |WHERE rk = 1""".stripMargin)),

    // ── OOD margin: distance to own centroid vs nearest other; the 20
    //    worst margins are the mislabel/OOD suspects.
    QueryDef("q_ood_margin",
      (s, d) => {
        val q = qvec(Tables.embeddings(s, d)).localCheckpoint(false)
        val cent = q
          .select(col("label"), posexplode(col("qv")).as(Seq("i", "v")))
          .groupBy(col("label"), col("i"))
          .agg(expr("CAST(floor(CAST(sum(v) AS DOUBLE) / count(1)) " +
            "AS BIGINT)").as("c"))
          .groupBy(col("label"))
          .agg(expr("transform(array_sort(collect_list(struct(i, c))), " +
            "s -> s.c)").as("cv"))
        val scored = q.crossJoin(broadcast(
            cent.select(col("label").as("cl"), col("cv"))))
          .select(col("vec_id"), col("label"), col("cl"),
            expr("""aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)),
                   |0L, (acc, v) -> acc + v)""".stripMargin).as("d2"))
        val own = scored.where(col("label") === col("cl"))
          .select(col("vec_id"), col("label"), col("d2").as("d_own"))
        val other = scored.where(col("label") =!= col("cl"))
          .groupBy(col("vec_id")).agg(min(col("d2")).as("d_other"))
        own.join(other, "vec_id")
          .withColumn("margin", col("d_other") - col("d_own"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("margin"), col("vec_id"))))
          .where(col("rk") <= 20).drop("rk")
      },
      Some(s"""WITH $qvecSql,
              |comp AS (SELECT label,
              |                unnest(qv) AS v,
              |                unnest(range(1, len(qv) + 1)) AS i
              |         FROM q),
              |cent AS (SELECT label, i,
              |                CAST(floor(CAST(sum(v) AS DOUBLE) / count(*))
              |                  AS BIGINT) AS c
              |         FROM comp GROUP BY 1, 2),
              |cv AS (SELECT label AS cl,
              |              list(c ORDER BY i) AS cv
              |       FROM cent GROUP BY 1),
              |scored AS (SELECT q.vec_id, q.label, cv.cl,
              |                  ${d2Sql("q.qv", "cv.cv")} AS d2
              |           FROM q CROSS JOIN cv),
              |own AS (SELECT vec_id, label, d2 AS d_own FROM scored
              |        WHERE label = cl),
              |oth AS (SELECT vec_id, CAST(min(d2) AS BIGINT) AS d_other
              |        FROM scored WHERE label <> cl GROUP BY 1)
              |SELECT vec_id, label, d_own, d_other,
              |       d_other - d_own AS margin
              |FROM (SELECT own.vec_id, label, d_own, d_other,
              |             d_other - d_own AS margin,
              |             row_number() OVER (ORDER BY d_other - d_own,
              |               own.vec_id) AS rk
              |      FROM own JOIN oth ON own.vec_id = oth.vec_id)
              |WHERE rk <= 20""".stripMargin)),

    // ── Isotropy: λ₁/trace of the scaled covariance via the integer
    //    Rayleigh quotient over the q_pca_power iterate.
    QueryDef("q_isotropy",
      (s, d) => {
        val dec = "decimal(38,0)"
        val gram = Similarity.gramMatrix(Tables.embeddings(s, d), 8)
          .localCheckpoint(false)
        val x1 = Similarity.powerIteration(gram, 8, 3)
        val sym = gram.select(col("i"), col("j"), col("g_e12"),
            col("n_rows"))
          .unionByName(gram.filter(col("i") =!= col("j"))
            .select(col("j").as("i"), col("i").as("j"), col("g_e12"),
              col("n_rows")))
        val gsc = sym.select(col("i"), col("j"),
          expr("""(CASE WHEN g_e12 >= 0 THEN g_e12 div n_rows
                 |ELSE -((-g_e12) div n_rows) END)""".stripMargin).as("g"))
          .localCheckpoint(false)
        val trace = gsc.where(col("i") === col("j"))
          .agg(sum(col("g")).as("tr"))
        val xx = x1.agg(sum(col("x_e4") * col("x_e4")).as("xx"))
        val gx = gsc.join(x1.select(col("i").as("j"), col("x_e4").as("xj")),
            "j")
          .groupBy(col("i")).agg(sum(col("g") * col("xj")).as("gx"))
        val lam = gx.join(x1, "i")
          .agg(sum(col("gx").cast(dec) * col("x_e4").cast(dec))
            .as("lam_num"))
        lam.crossJoin(xx).crossJoin(trace)
          .selectExpr("CAST(8 AS BIGINT) AS dims", "CAST(tr AS BIGINT) AS trace_e12",
            s"CAST(lam_num div CAST(xx AS $dec) AS BIGINT) AS lam1_e12",
            s"""CAST(lam_num * 1000000 div
               |(CAST(xx AS $dec) * CAST(tr AS $dec)) AS BIGINT)
               |AS share_e6""".stripMargin)
      },
      Some {
        def c(i: Int) =
          s"CAST(floor(CAST(embedding AS DOUBLE[])[${i + 1}] * 1000000 + 0.5) AS BIGINT)"
        val dims = 8
        val pairs = for (i <- 0 until dims; j <- i until dims) yield (i, j)
        val comps = (0 until dims).map(i => s"${c(i)} AS c$i")
          .mkString(",\n  ")
        val sums = pairs.map { case (i, j) =>
          s"sum(c$i * c$j) AS g_${i}_$j" }.mkString(",\n  ")
        val gp = pairs.map { case (i, j) =>
          s"SELECT $i AS i, $j AS j, g_${i}_$j AS g, n_rows FROM m"
        }.mkString("\nUNION ALL\n")
        def sdiv(v: String, dv: String) =
          s"(CASE WHEN ($v) >= 0 THEN ($v) // ($dv) ELSE -((-($v)) // ($dv)) END)"
        def loopJ(k: Int) =
          s"""y$k AS (SELECT gsc.i AS i, sum(gsc.g * x${k - 1}.x) AS y
             |        FROM gsc JOIN x${k - 1} ON x${k - 1}.j = gsc.j
             |        GROUP BY 1),
             |m$k AS (SELECT max(abs(y)) AS my FROM y$k),
             |x$k AS (SELECT i AS j, ${sdiv("y", "greatest(1, my // 10000)")}
             |          AS x
             |        FROM y$k CROSS JOIN m$k)""".stripMargin
        s"""WITH cc AS (SELECT
           |  $comps
           |  FROM embeddings),
           |m AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n_rows,
           |  $sums
           |  FROM cc),
           |gp AS ($gp),
           |sym AS (SELECT i, j, g, n_rows FROM gp
           |        UNION ALL
           |        SELECT j, i, g, n_rows FROM gp WHERE i <> j),
           |gsc AS MATERIALIZED (SELECT i, j, ${sdiv("g", "n_rows")} AS g
           |                     FROM sym),
           |x0 AS (SELECT range AS j, CAST(10000 AS BIGINT) AS x
           |       FROM range($dims)),
           |${loopJ(1)},
           |${loopJ(2)},
           |${loopJ(3)},
           |tr AS (SELECT sum(g) AS tr FROM gsc WHERE i = j),
           |xx AS (SELECT sum(x * x) AS xx FROM x3),
           |gx AS (SELECT gsc.i AS i, sum(gsc.g * v.x) AS gx
           |       FROM gsc JOIN x3 v ON v.j = gsc.j GROUP BY 1),
           |lam AS (SELECT sum(CAST(gx.gx AS HUGEINT)
           |               * CAST(v.x AS HUGEINT)) AS lam_num
           |        FROM gx JOIN x3 v ON v.j = gx.i)
           |SELECT CAST($dims AS BIGINT) AS dims,
           |       CAST(tr AS BIGINT) AS trace_e12,
           |       CAST(lam_num // CAST(xx AS HUGEINT) AS BIGINT)
           |         AS lam1_e12,
           |       CAST(lam_num * 1000000 //
           |         (CAST(xx AS HUGEINT) * CAST(tr AS HUGEINT))
           |         AS BIGINT) AS share_e6
           |FROM lam CROSS JOIN xx CROSS JOIN tr""".stripMargin
      })
  )
}
