package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Quantiles, Similarity}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-159 batch — three families the registry lacked:
  *
  *  - Brown–Forsythe variance homogeneity (`q_levene_bf`): the
  *    median-based Levene test — the robust pre-check every ANOVA user
  *    needs (q_anova exists; its equal-variance assumption did not).
  *    Group medians come from [[Quantiles.groupedPercentile]]'s
  *    histogram selection (never a per-group sort — the 100 TB path),
  *    then ONE moment aggregate builds the F statistic. Units are
  *    hecto-dollars so every worst-case moment stays inside BIGINT.
  *  - STL-lite seasonal decomposition (`q_stl_lite`): trend = 7-day
  *    centered moving average on the bounded daily axis, seasonal =
  *    per-day-of-week mean of the detrended series re-centered to sum
  *    zero, residual = remainder — the classic additive decomposition
  *    with every division the engine-portable truncate-toward-zero
  *    (verified: DuckDB -7//2 = Spark -7 div 2 = -3).
  *  - Calinski–Harabasz index (`q_calinski_harabasz`): the
  *    between/within variance-ratio cluster-quality score over the
  *    labeled embeddings — completes the internal-validity trio next
  *    to q_silhouette and q_davies_bouldin. Centroids round to 4 dp,
  *    distances to 6 dp, sums are exact integers after e6 scaling
  *    (the q_kmeans_inertia_curve convention).
  */
object Round159Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Brown–Forsythe: z = |x − median_g| in hecto-dollars; F =
    //    [Σ n_g(z̄_g−z̄)²/(k−1)] / [ΣΣ(z−z̄_g)²/(N−k)] with truncated
    //    integer group means (identical truncation both engines).
    //    Bounds: z ≤ 1050 → within/between ≤ 6e5·1.1e6 ≈ 6.6e11; msb·1e6
    //    ≤ 6.6e17 — no overflow at ANY data skew.
    QueryDef("q_levene_bf",
      (s, d) => {
        val x = Tables.lineitem(s, d).select(col("l_returnflag").as("g"),
          expr("CAST(floor(l_extendedprice) AS BIGINT) div 100").as("x"))
        val med = Quantiles.groupedPercentile(x, "g", "x", 500000L)
          .select(col("g"), col("value").as("med_h"))
        val z = x.join(broadcast(med), "g")
          .select(col("g"), col("med_h"), abs(col("x") - col("med_h")).as("z"))
          .localCheckpoint(false) // one scan feeds group AND global moments
        val grp = z.groupBy(col("g"))
          .agg(first(col("med_h")).as("med_h"), count(lit(1)).as("n"),
            sum(col("z")).as("sz"), sum(col("z") * col("z")).as("sz2"))
          .withColumn("zbar", expr("sz div n"))
          // within_g = Σz² − 2·z̄Σz + n·z̄² (exact given truncated z̄)
          .withColumn("w_g",
            expr("sz2 - 2 * zbar * sz + n * zbar * zbar"))
          .localCheckpoint(false) // 3-row axis
        val tot = grp.agg(sum(col("n")).as("nn"), sum(col("sz")).as("szt"),
          count(lit(1)).as("k"))
          .withColumn("zbart", expr("szt div nn"))
        grp.crossJoin(broadcast(tot))
          .withColumn("b_g",
            expr("n * (zbar - zbart) * (zbar - zbart)"))
          .groupBy(col("nn"), col("k"), col("zbart"))
          .agg(sum(col("b_g")).as("between_h2"), sum(col("w_g")).as("within_h2"))
          .selectExpr("CAST(nn AS BIGINT) AS n_rows",
            "CAST(k AS BIGINT) AS n_groups", "zbart AS zbar_h",
            "between_h2", "within_h2",
            """(between_h2 * 1000000 div (k - 1))
              | div greatest(1L, within_h2 div (nn - k)) AS f_e6"""
              .stripMargin)
      },
      Some("""WITH x AS (SELECT l_returnflag AS g,
             |                 CAST(floor(l_extendedprice) AS BIGINT) // 100
             |                   AS x
             |           FROM lineitem),
             |st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             |              (count(*) * 500000 + 999999) // 1000000 AS kk
             |       FROM x GROUP BY g),
             |r AS (SELECT g, x, row_number() OVER (PARTITION BY g
             |        ORDER BY x) AS rn FROM x),
             |med AS (SELECT r.g, r.x AS med_h FROM r JOIN st
             |        ON st.g = r.g AND r.rn = st.kk),
             |z AS (SELECT x.g, med.med_h, abs(x.x - med.med_h) AS z
             |      FROM x JOIN med ON x.g = med.g),
             |grp AS (SELECT g, CAST(min(med_h) AS BIGINT) AS med_h,
             |               CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(z) AS BIGINT) AS sz,
             |               CAST(sum(z * z) AS BIGINT) AS sz2
             |        FROM z GROUP BY g),
             |g2 AS (SELECT *, sz // n AS zbar,
             |              sz2 - 2 * (sz // n) * sz + n * (sz // n) * (sz // n)
             |                AS w_g
             |       FROM grp),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
             |               CAST(sum(sz) AS BIGINT) AS szt,
             |               CAST(count(*) AS BIGINT) AS k,
             |               CAST(sum(sz) AS BIGINT) // CAST(sum(n) AS BIGINT)
             |                 AS zbart
             |        FROM g2)
             |SELECT nn AS n_rows, k AS n_groups, zbart AS zbar_h,
             |       CAST(sum(n * (zbar - zbart) * (zbar - zbart)) AS BIGINT)
             |         AS between_h2,
             |       CAST(sum(w_g) AS BIGINT) AS within_h2,
             |       (CAST(sum(n * (zbar - zbart) * (zbar - zbart)) AS BIGINT)
             |          * 1000000 // (k - 1))
             |         // greatest(1, CAST(sum(w_g) AS BIGINT) // (nn - k))
             |         AS f_e6
             |FROM g2 CROSS JOIN tot
             |GROUP BY nn, k, zbart""".stripMargin)),

    // ── STL-lite: day axis (bounded, post-aggregate) → centered 7-day
    //    MA trend (full windows only), per-dow seasonal re-centered to
    //    Σ=0 over the week, residual. NULL trend at the 3-day edges.
    QueryDef("q_stl_lite",
      (s, d) => {
        val daily = Tables.events(s, d)
          .selectExpr("unix_micros(ts) div 86400000000 AS day")
          .groupBy(col("day")).agg(count(lit(1)).as("n"))
        val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
        // checkpoint AFTER the window so (a) the moving average runs
        // once for its two consumers and (b) the unpartitioned window's
        // visible input keeps the bounded day-axis Aggregate (gate)
        val tr = daily
          .withColumn("wn", count(lit(1)).over(w7))
          .withColumn("s7", sum(col("n")).over(w7))
          .withColumn("trend", when(col("wn") === 7, expr("s7 div 7")))
          .drop("s7")
          .withColumn("detr", col("n") - col("trend"))
          .withColumn("dow", col("day") % 7)
          .localCheckpoint(false) // 30-row axis; seas + final join share it
        val seas = tr.filter(col("detr").isNotNull)
          .groupBy(col("dow"))
          .agg(expr("sum(detr) div count(1)").as("s_raw"))
        val sAdj = seas.crossJoin(broadcast(
            seas.agg(expr("sum(s_raw) div count(1)").as("s_mean"))))
          .select(col("dow"), (col("s_raw") - col("s_mean")).as("seasonal"))
        tr.join(broadcast(sAdj), Seq("dow"), "left")
          .selectExpr("day", "CAST(dow AS BIGINT) AS dow", "n", "trend",
            "detr AS detrended", "seasonal",
            "detr - seasonal AS residual")
      },
      Some("""WITH daily AS (
             |  SELECT epoch_us(ts) // 86400000000 AS day,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1),
             |tr AS (SELECT day, n,
             |         CASE WHEN count(*) OVER w = 7
             |           THEN CAST(sum(n) OVER w AS BIGINT) // 7 END AS trend
             |       FROM daily
             |       WINDOW w AS (ORDER BY day
             |         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |dt AS (SELECT day, day % 7 AS dow, n, trend,
             |              n - trend AS detr FROM tr),
             |seas AS (SELECT dow, CAST(sum(detr) AS BIGINT) // count(*)
             |           AS s_raw
             |         FROM dt WHERE detr IS NOT NULL GROUP BY 1),
             |sm AS (SELECT CAST(sum(s_raw) AS BIGINT) // count(*) AS s_mean
             |       FROM seas),
             |sa AS (SELECT dow, s_raw - s_mean AS seasonal
             |       FROM seas CROSS JOIN sm)
             |SELECT dt.day, CAST(dt.dow AS BIGINT) AS dow, dt.n, dt.trend,
             |       dt.detr AS detrended, sa.seasonal,
             |       dt.detr - sa.seasonal AS residual
             |FROM dt LEFT JOIN sa ON dt.dow = sa.dow""".stripMargin)),

    // ── Calinski–Harabasz over the labeled embeddings: B = Σ n_l·
    //    d²(c_l, c̄), W = Σ d²(x, c_label); CH = (B/(k−1))/(W/(n−k)).
    //    One explode feeds both centroid builds; distances are
    //    per-element joins on (label, i) — groupBy-partial all the way,
    //    no wide pivot, no all-pairs.
    //    Everything lives on the 4dp-quantized integer grid (v_e4 =
    //    round(v·1e4), centroids = truncated integer means of v_e4) so
    //    every sum is EXACT — the first draft summed 64 doubles per
    //    distance and the accumulation-order ulp flipped a 6dp rounding
    //    at sf0.001 (only B; W matched — the classic silent class).
    QueryDef("q_calinski_harabasz",
      (s, d) => {
        val e = Similarity.cast(Tables.embeddings(s, d))
          .select(col("vec_id"), col("label").cast("long").as("label"),
            col("ev"))
        val el = e.select(col("vec_id"), col("label"),
            posexplode(col("ev")).as(Seq("i", "v")))
          .selectExpr("vec_id", "label", "i",
            "CAST(round(v * 10000) AS BIGINT) AS v_e4")
          .localCheckpoint(false) // one explode feeds centroids AND W
        val cent = el.groupBy(col("label"), col("i"))
          .agg(expr("sum(v_e4) div count(1)").as("c_e4"),
            count(lit(1)).as("n_l"))
          .localCheckpoint(false) // label×dim axis (10×64)
        val gcent = cent.groupBy(col("i"))
          .agg(expr("sum(c_e4) div count(1)").as("gc_e4"))
        val bPer = cent.join(broadcast(gcent), "i")
          .groupBy(col("label"))
          .agg(sum(expr("(c_e4 - gc_e4) * (c_e4 - gc_e4)")).as("d2_e8"),
            first(col("n_l")).as("n_l"))
          .selectExpr("label", "n_l * d2_e8 AS b_l_e8")
        val b = bPer.agg(sum(col("b_l_e8")).as("b_e8"),
          count(lit(1)).as("k"))
        val w = el.join(broadcast(cent.select(col("label"), col("i"),
            col("c_e4"))), Seq("label", "i"))
          .groupBy(col("vec_id"))
          .agg(sum(expr("(v_e4 - c_e4) * (v_e4 - c_e4)")).as("w_e8"))
          .agg(sum(col("w_e8")).as("w_e8"), count(lit(1)).as("n"))
        b.crossJoin(broadcast(w))
          .selectExpr("CAST(n AS BIGINT) AS n_vecs",
            "CAST(k AS BIGINT) AS n_clusters",
            "b_e8 div 100 AS b_e6", "w_e8 div 100 AS w_e6",
            """(b_e8 div (k - 1)) * 1000000
              | div greatest(1L, w_e8 div (n - k)) AS ch_e6""".stripMargin)
      },
      Some("""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
             |                 CAST(embedding AS DOUBLE[]) AS ev
             |           FROM embeddings),
             |el AS (SELECT vec_id, label,
             |              generate_subscripts(ev, 1) - 1 AS i,
             |              CAST(round(unnest(ev) * 10000) AS BIGINT) AS v_e4
             |       FROM e),
             |cent AS (SELECT label, i,
             |                CAST(sum(v_e4) AS BIGINT) // count(*) AS c_e4,
             |                CAST(count(*) AS BIGINT) AS n_l
             |         FROM el GROUP BY 1, 2),
             |gcent AS (SELECT i, CAST(sum(c_e4) AS BIGINT) // count(*)
             |            AS gc_e4
             |          FROM cent GROUP BY 1),
             |bper AS (SELECT cent.label,
             |                min(cent.n_l) * CAST(sum((cent.c_e4 - gcent.gc_e4)
             |                  * (cent.c_e4 - gcent.gc_e4)) AS BIGINT)
             |                  AS b_l_e8
             |         FROM cent JOIN gcent ON cent.i = gcent.i
             |         GROUP BY cent.label),
             |bb AS (SELECT CAST(sum(b_l_e8) AS BIGINT) AS b_e8,
             |              CAST(count(*) AS BIGINT) AS k
             |       FROM bper),
             |wper AS (SELECT el.vec_id,
             |                CAST(sum((el.v_e4 - cent.c_e4)
             |                  * (el.v_e4 - cent.c_e4)) AS BIGINT) AS w_e8
             |         FROM el JOIN cent
             |           ON el.label = cent.label AND el.i = cent.i
             |         GROUP BY el.vec_id),
             |ww AS (SELECT CAST(sum(w_e8) AS BIGINT) AS w_e8,
             |              CAST(count(*) AS BIGINT) AS n
             |       FROM wper)
             |SELECT n AS n_vecs, k AS n_clusters,
             |       b_e8 // 100 AS b_e6, w_e8 // 100 AS w_e6,
             |       (b_e8 // (k - 1)) * 1000000
             |         // greatest(1, w_e8 // (n - k)) AS ch_e6
             |FROM bb CROSS JOIN ww""".stripMargin))
  )
}
