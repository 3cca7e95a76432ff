package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-165 batch — the LOCAL spatial-autocorrelation family, completing
  * the global single-number reads (q_morans_i, q_getis_ord) with the
  * per-cell decomposition an analyst actually maps:
  *
  *  - Local Moran's I (LISA, `q_local_morans`): per latitude band,
  *    I_i = n·z_i·Σ_{j∈N(i)} z_j / Σz² with the Anselin HH/LL/HL/LH
  *    quadrant labels — WHERE the clustering lives, not just whether it
  *    exists. Same rook adjacency (|Δband| = 1) and the same exact
  *    n²-scaled integer centering (z = n·x − Σx) as q_morans_i, so the
  *    global I is literally sum(local numerators)/(W·Σz²) of this frame.
  *  - Geary's C (`q_gearys_c`): the difference-based global twin —
  *    C = (n−1)·Σ_{adj}(z_i−z_j)² / (2W·Σz²). Sensitive to local
  *    dissimilarity where Moran's I reads co-movement; C≈1 null,
  *    C<1 positive autocorrelation. All-integer until one division.
  *  - Join counts (`q_join_counts`): binarize bands hot/cold at the
  *    mean (z>0) and count BB/WW/BW adjacent pairs vs the free-sampling
  *    expectation E[BB] = W·p_b², E[BW] = 2W·p_b·p_w — the categorical
  *    spatial-autocorrelation test (hot next to hot more than chance?).
  *
  * Scale: the band axis is bounded (34 cells) — every aggregate is a
  * partial+final over it; the neighbor "join" is a shifted union +
  * groupBy on the bounded axis, no pairwise blow-up. At 100 TB the only
  * full-data pass is the first groupBy(band); everything after runs on
  * 34 rows. Reference anchor: the reference's heatmap cells
  * (heatmap_stream.py:105-125) are exactly such bounded spatial bins.
  */
object Round165Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── LISA: z and neighbor-lag per band; quadrant from the signs.
    QueryDef("q_local_morans",
      (s, d) => {
        val bands = Tables.events(s, d)
          .select(expr("(user_id * 37 % 17000) div 500").as("band"))
          .groupBy(col("band")).agg(count(lit(1)).as("x"))
          .localCheckpoint(false) // reused: z build + both neighbor shifts
        val tot = bands.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val z = bands.crossJoin(broadcast(tot))
          .withColumn("z", expr(s"CAST(n * x - sx AS $dec)"))
          .localCheckpoint(false)
        val nb = z.select((col("band") + 1).as("band"), col("z").as("zn"))
          .unionByName(
            z.select((col("band") - 1).as("band"), col("z").as("zn")))
        val lag = nb.groupBy(col("band"))
          .agg(sum(col("zn")).as("lagz"), count(lit(1)).as("wdeg"))
        val zz = z.agg(sum(expr("z * z")).as("zz"))
        z.join(lag, Seq("band"), "left").crossJoin(broadcast(zz))
          .selectExpr("band", "x", "CAST(z AS BIGINT) AS z",
            "CAST(coalesce(wdeg, 0) AS BIGINT) AS wdeg",
            "CAST(coalesce(lagz, 0) AS BIGINT) AS lag_z",
            s"""round(CAST(CAST(n AS $dec) * z * coalesce(lagz, 0)
               |  AS DOUBLE) / CAST(zz AS DOUBLE), 6) AS local_i"""
              .stripMargin,
            """CASE WHEN coalesce(wdeg, 0) = 0 OR z = 0
              |       OR coalesce(lagz, 0) = 0 THEN 'NA'
              |     WHEN z > 0 AND lagz > 0 THEN 'HH'
              |     WHEN z < 0 AND lagz < 0 THEN 'LL'
              |     WHEN z > 0 THEN 'HL' ELSE 'LH' END AS quadrant"""
              .stripMargin)
      },
      Some("""WITH bands AS (
             |  SELECT (user_id * 37 % 17000) // 500 AS band,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS sx FROM bands),
             |z AS (SELECT band, x, n,
             |             CAST(n * x - sx AS HUGEINT) AS z
             |      FROM bands CROSS JOIN tot),
             |nb AS (SELECT band + 1 AS band, z AS zn FROM z
             |       UNION ALL
             |       SELECT band - 1 AS band, z AS zn FROM z),
             |lag AS (SELECT band, CAST(sum(zn) AS HUGEINT) AS lagz,
             |               CAST(count(*) AS BIGINT) AS wdeg
             |        FROM nb GROUP BY 1),
             |zz AS (SELECT CAST(sum(z * z) AS HUGEINT) AS zz FROM z)
             |SELECT z.band AS band, x, CAST(z AS BIGINT) AS z,
             |       CAST(coalesce(wdeg, 0) AS BIGINT) AS wdeg,
             |       CAST(coalesce(lagz, 0) AS BIGINT) AS lag_z,
             |       round(CAST(CAST(n AS HUGEINT) * z
             |           * coalesce(lagz, 0) AS DOUBLE)
             |         / CAST(zz AS DOUBLE), 6) AS local_i,
             |       CASE WHEN coalesce(wdeg, 0) = 0 OR z = 0
             |              OR coalesce(lagz, 0) = 0 THEN 'NA'
             |            WHEN z > 0 AND lagz > 0 THEN 'HH'
             |            WHEN z < 0 AND lagz < 0 THEN 'LL'
             |            WHEN z > 0 THEN 'HL' ELSE 'LH' END AS quadrant
             |FROM z LEFT JOIN lag ON lag.band = z.band
             |CROSS JOIN zz""".stripMargin)),

    // ── Geary's C: (n−1)·Σ_adj(z_i−z_j)² / (2·W_unordered·Σz²).
    QueryDef("q_gearys_c",
      (s, d) => {
        val bands = Tables.events(s, d)
          .select(expr("(user_id * 37 % 17000) div 500").as("band"))
          .groupBy(col("band")).agg(count(lit(1)).as("x"))
          .localCheckpoint(false)
        val tot = bands.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val z = bands.crossJoin(broadcast(tot))
          .withColumn("z", expr(s"CAST(n * x - sx AS $dec)"))
          .localCheckpoint(false)
        val adj = z.join(z.select((col("band") + 1).as("band"),
            col("z").as("z2")), "band")
          .agg(sum(expr("(z - z2) * (z - z2)")).as("dsum"),
            count(lit(1)).as("w_half"))
        val den = z.agg(sum(expr("z * z")).as("zz"), max(col("n")).as("n"))
        adj.crossJoin(den)
          .selectExpr("CAST(n AS BIGINT) AS n_bands",
            "2 * w_half AS w_pairs",
            s"""round(CAST(CAST(n - 1 AS $dec) * dsum AS DOUBLE)
               |/ (CAST('2.0' AS DOUBLE) * CAST(w_half AS DOUBLE)
               |   * CAST(zz AS DOUBLE)), 6) AS gearys_c""".stripMargin)
      },
      Some("""WITH bands AS (
             |  SELECT (user_id * 37 % 17000) // 500 AS band,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS sx FROM bands),
             |z AS (SELECT band, CAST(n * x - sx AS HUGEINT) AS z, n
             |      FROM bands CROSS JOIN tot),
             |adj AS (SELECT sum((a.z - b.z) * (a.z - b.z)) AS dsum,
             |               CAST(count(*) AS BIGINT) AS w_half
             |        FROM z a JOIN z b ON b.band = a.band + 1),
             |den AS (SELECT CAST(sum(z * z) AS HUGEINT) AS zz,
             |               max(n) AS n FROM z)
             |SELECT CAST(n AS BIGINT) AS n_bands, 2 * w_half AS w_pairs,
             |       round(CAST(CAST(n - 1 AS HUGEINT) * dsum AS DOUBLE)
             |         / (CAST('2.0' AS DOUBLE) * CAST(w_half AS DOUBLE)
             |            * CAST(zz AS DOUBLE)), 6) AS gearys_c
             |FROM adj CROSS JOIN den""".stripMargin)),

    // ── Join counts: hot = above-mean band (z>0); BB/WW/BW over the
    //    rook pairs vs free-sampling expectations, e6 integers.
    QueryDef("q_join_counts",
      (s, d) => {
        val bands = Tables.events(s, d)
          .select(expr("(user_id * 37 % 17000) div 500").as("band"))
          .groupBy(col("band")).agg(count(lit(1)).as("x"))
          .localCheckpoint(false)
        val tot = bands.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val h = bands.crossJoin(broadcast(tot))
          .withColumn("hot",
            expr("CASE WHEN n * x - sx > 0 THEN 1 ELSE 0 END"))
          .localCheckpoint(false)
        val pairs = h.join(h.select((col("band") + 1).as("band"),
            col("hot").as("hot2")), "band")
          .agg(sum(expr("hot * hot2")).as("bb"),
            sum(expr("(1 - hot) * (1 - hot2)")).as("ww"),
            sum(expr("CASE WHEN hot <> hot2 THEN 1 ELSE 0 END")).as("bw"),
            count(lit(1)).as("w"))
        val marg = h.agg(sum(col("hot")).as("nb"), max(col("n")).as("n"))
        pairs.crossJoin(marg)
          .selectExpr("CAST(w AS BIGINT) AS w_pairs",
            "CAST(bb AS BIGINT) AS bb", "CAST(ww AS BIGINT) AS ww",
            "CAST(bw AS BIGINT) AS bw",
            "w * nb * nb * 1000000 div (n * n) AS e_bb_e6",
            "w * 2 * nb * (n - nb) * 1000000 div (n * n) AS e_bw_e6")
      },
      Some("""WITH bands AS (
             |  SELECT (user_id * 37 % 17000) // 500 AS band,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS sx FROM bands),
             |h AS (SELECT band,
             |             CASE WHEN n * x - sx > 0 THEN 1 ELSE 0 END
             |               AS hot, n
             |      FROM bands CROSS JOIN tot),
             |pairs AS (SELECT CAST(sum(a.hot * b.hot) AS BIGINT) AS bb,
             |                 CAST(sum((1 - a.hot) * (1 - b.hot))
             |                   AS BIGINT) AS ww,
             |                 CAST(sum(CASE WHEN a.hot <> b.hot THEN 1
             |                               ELSE 0 END) AS BIGINT) AS bw,
             |                 CAST(count(*) AS BIGINT) AS w
             |          FROM h a JOIN h b ON b.band = a.band + 1),
             |marg AS (SELECT CAST(sum(hot) AS BIGINT) AS nb,
             |                max(n) AS n FROM h)
             |SELECT w AS w_pairs, bb, ww, bw,
             |       w * nb * nb * 1000000 // (n * n) AS e_bb_e6,
             |       w * 2 * nb * (n - nb) * 1000000 // (n * n) AS e_bw_e6
             |FROM pairs CROSS JOIN marg""".stripMargin))
  )
}
