package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-83 batch: circular statistics of event hour-of-day (resultant
  * length — the CORRECT concentration measure on a 24 h clock, where a
  * linear mean of 23:00 and 01:00 says noon), Moran's I spatial
  * autocorrelation over latitude-band volumes (do neighboring bands
  * move together — the spatial analogue of q_acf), and cut conductance
  * sweeps over the event digraph (how separable the node space is at
  * three id cuts — the cheap bound behind q_modularity).
  */
object Round83Queries {

  /** cos(m·15°)·1e6, m = 0..23 (shared with Round66). */
  private val cosT = Seq(1000000L, 965926L, 866025L, 707107L, 500000L,
    258819L, 0L, -258819L, -500000L, -707107L, -866025L, -965926L,
    -1000000L, -965926L, -866025L, -707107L, -500000L, -258819L, 0L,
    258819L, 500000L, 707107L, 866025L, 965926L)

  private def caseFor(idx: String, shift: Int): String =
    "CASE " + cosT.indices.map { m =>
      s"WHEN ($idx + $shift) % 24 = $m THEN ${cosT(m)}"
    }.mkString(" ") + " ELSE 0 END"

  def defs: Seq[QueryDef] = Seq(

    // ── Circular stats: per type the e6 resultant components and
    //    R̄ = |Σe^{iθ}|/n (one sqrt close; atan2 deliberately avoided —
    //    libm atan2 is not IEEE-pinned across engines).
    QueryDef("q_circular_stats",
      (s, d) => Tables.events(s, d)
        .select(col("event_type").as("et"),
          expr("(unix_micros(ts) div 3600000000) % 24").as("hod"))
        .withColumn("cosv", expr(caseFor("hod", 0)))
        .withColumn("sinv", expr(caseFor("hod", 18)))
        .groupBy(col("et"))
        .agg(count(lit(1)).as("n"), sum(col("cosv")).as("c_sum_e6"),
          sum(col("sinv")).as("s_sum_e6"))
        .selectExpr("et", "n", "c_sum_e6", "s_sum_e6",
          """round(sqrt(CAST(c_sum_e6 AS DOUBLE) * CAST(c_sum_e6 AS DOUBLE)
            |+ CAST(s_sum_e6 AS DOUBLE) * CAST(s_sum_e6 AS DOUBLE))
            |/ (CAST(n AS DOUBLE) * CAST('1000000' AS DOUBLE)), 6)
            |AS rbar""".stripMargin),
      Some(s"""WITH e AS (
              |  SELECT event_type AS et,
              |         (epoch_us(ts) // 3600000000) % 24 AS hod
              |  FROM events),
              |t AS (SELECT et, ${caseFor("hod", 0)} AS cosv,
              |             ${caseFor("hod", 18)} AS sinv
              |      FROM e),
              |m AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
              |             CAST(sum(cosv) AS BIGINT) AS c_sum_e6,
              |             CAST(sum(sinv) AS BIGINT) AS s_sum_e6
              |      FROM t GROUP BY 1)
              |SELECT et, n, c_sum_e6, s_sum_e6,
              |       round(sqrt(CAST(c_sum_e6 AS DOUBLE)
              |           * CAST(c_sum_e6 AS DOUBLE)
              |         + CAST(s_sum_e6 AS DOUBLE)
              |           * CAST(s_sum_e6 AS DOUBLE))
              |         / (CAST(n AS DOUBLE) * CAST('1000000' AS DOUBLE)), 6)
              |         AS rbar
              |FROM m""".stripMargin)),

    // ── Moran's I over latitude-band event volumes, rook adjacency
    //    (|Δband| = 1): exact n²-scaled integer moments, one close.
    QueryDef("q_morans_i",
      (s, d) => {
        val dec = "decimal(38,0)"
        val bands = Tables.events(s, d)
          .select(expr("(user_id * 37 % 17000) div 500").as("band"))
          .groupBy(col("band")).agg(count(lit(1)).as("x"))
          .localCheckpoint(false) // both adjacency sides + moments
        val tot = bands.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val z = bands.crossJoin(broadcast(tot))
          .withColumn("z", expr(s"CAST(n * x - sx AS $dec)"))
          .localCheckpoint(false)
        val num = z.join(z.select((col("band") + 1).as("band"),
            col("z").as("z2")), "band")
          .agg(sum(expr("z * z2")).as("cross2"), count(lit(1)).as("w_half"))
        val den = z.agg(sum(expr("z * z")).as("zz"), max("n").as("n"))
        num.crossJoin(den)
          .selectExpr("CAST(n AS BIGINT) AS n_bands",
            "2 * w_half AS w_pairs",
            """round(CAST(n AS DOUBLE) * (CAST('2.0' AS DOUBLE)
              |* CAST(cross2 AS DOUBLE))
              |/ (CAST(2 * w_half AS DOUBLE) * CAST(zz AS DOUBLE)), 6)
              |AS morans_i""".stripMargin)
      },
      Some("""WITH bands AS (
             |  SELECT (user_id * 37 % 17000) // 500 AS band,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS sx FROM bands),
             |z AS (SELECT band, CAST(n * x - sx AS HUGEINT) AS z
             |      FROM bands CROSS JOIN tot),
             |num AS (SELECT sum(a.z * b.z) AS cross2,
             |               CAST(count(*) AS BIGINT) AS w_half
             |        FROM z a JOIN z b ON b.band = a.band + 1),
             |den AS (SELECT sum(z * z) AS zz,
             |               (SELECT n FROM tot) AS n FROM z)
             |SELECT CAST(n AS BIGINT) AS n_bands, 2 * w_half AS w_pairs,
             |       round(CAST(n AS DOUBLE) * (CAST('2.0' AS DOUBLE)
             |         * CAST(cross2 AS DOUBLE))
             |         / (CAST(2 * w_half AS DOUBLE) * CAST(zz AS DOUBLE)),
             |         6) AS morans_i
             |FROM num CROSS JOIN den""".stripMargin)),

    // ── Conductance sweep: cuts at id < {125, 250, 375} on the event
    //    digraph; φ = cut / min(vol_S, vol_S̄), exact e6.
    QueryDef("q_conductance",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(least(col("user_id") % 500, col("event_id") % 500).as("a"),
            greatest(col("user_id") % 500, col("event_id") % 500).as("b"))
          .where(col("a") =!= col("b")).distinct()
          .localCheckpoint(false)
        Seq(125L, 250L, 375L).map { c =>
          e.agg(
              sum(when((col("a") < c) =!= (col("b") < c), 1L).otherwise(0L))
                .as("cut"),
              sum(when(col("a") < c, 1L).otherwise(0L) +
                when(col("b") < c, 1L).otherwise(0L)).as("vol_s"),
              count(lit(1)).as("m"))
            .select(lit(c).as("cut_at"), col("cut"), col("vol_s"),
              (col("m") * 2 - col("vol_s")).as("vol_rest"),
              expr("cut * 1000000 div greatest(least(vol_s, m * 2 - vol_s)," +
                " 1)").as("phi_e6"))
        }.reduce(_ unionByName _)
      },
      Some {
        def piece(c: Long) =
          s"""SELECT CAST($c AS BIGINT) AS cut_at,
             |       CAST(sum(CASE WHEN (a < $c) <> (b < $c) THEN 1
             |                     ELSE 0 END) AS BIGINT) AS cut,
             |       CAST(sum((CASE WHEN a < $c THEN 1 ELSE 0 END)
             |                + (CASE WHEN b < $c THEN 1 ELSE 0 END))
             |         AS BIGINT) AS vol_s,
             |       CAST(count(*) AS BIGINT) * 2
             |         - CAST(sum((CASE WHEN a < $c THEN 1 ELSE 0 END)
             |                + (CASE WHEN b < $c THEN 1 ELSE 0 END))
             |             AS BIGINT) AS vol_rest,
             |       CAST(sum(CASE WHEN (a < $c) <> (b < $c) THEN 1
             |                     ELSE 0 END) AS BIGINT) * 1000000
             |         // greatest(least(
             |              CAST(sum((CASE WHEN a < $c THEN 1 ELSE 0 END)
             |                   + (CASE WHEN b < $c THEN 1 ELSE 0 END))
             |                AS BIGINT),
             |              CAST(count(*) AS BIGINT) * 2
             |              - CAST(sum((CASE WHEN a < $c THEN 1 ELSE 0 END)
             |                     + (CASE WHEN b < $c THEN 1 ELSE 0 END))
             |                  AS BIGINT)), 1) AS phi_e6
             |FROM e""".stripMargin
        s"""WITH e AS (
           |  SELECT DISTINCT least(user_id % 500, event_id % 500) AS a,
           |         greatest(user_id % 500, event_id % 500) AS b
           |  FROM events WHERE user_id % 500 <> event_id % 500)
           |${Seq(125L, 250L, 375L).map(piece).mkString("\nUNION ALL\n")}"""
          .stripMargin
      })
  )
}
