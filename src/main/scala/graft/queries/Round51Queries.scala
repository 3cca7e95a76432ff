package graft.queries

import graft.{QueryDef, Tables}
import graft.geo.HexSql
import graft.ops.{Curation, Experiment, Mobility}
import org.apache.spark.sql.functions._

/** Round-51 batch: convoy detection (the temporal-persistence upgrade
  * of q_colocation — sustained co-movement, not chance contact), LLM
  * corpus mixture reweighting with effective-sample-size accounting
  * (the cost side of importance weighting, completing the
  * q_sample_stratified / q_doc_mix curation family), and per-segment
  * minimum-detectable-effect sizing (the PLANNING half of the
  * experimentation family — q_welch_ttest judges a finished test, this
  * says what a future one can see).
  */
object Round51Queries {

  private val res = 3
  private val posCell = HexSql.withCellId(Tables.positionsSql, "lat", "lon", res)
  private val bucketUs = 21600000000L // 6-hour convoy buckets

  def defs: Seq[QueryDef] = Seq(

    // ── Convoys: pairs sharing a (cell, 6-hour) block in ≥2
    //    CONSECUTIVE buckets. Pair presence dedups to (pair, bucket)
    //    before the gaps-and-islands run detection.
    QueryDef("q_convoy",
      (s, d) => Mobility.convoys(Tables.positions(s, d), res, bucketUs, 2),
      Some(s"""WITH presence AS (
              |  SELECT DISTINCT vehicleId AS veh, cell_id AS cell,
              |         epoch_us(eventTs) // $bucketUs AS bkt
              |  FROM $posCell t),
              |pb AS (
              |  SELECT DISTINCT a.veh AS veh_a, b.veh AS veh_b, a.bkt
              |  FROM presence a JOIN presence b
              |    ON a.cell = b.cell AND a.bkt = b.bkt AND a.veh < b.veh),
              |runs AS (
              |  SELECT veh_a, veh_b,
              |         bkt - row_number() OVER (PARTITION BY veh_a, veh_b
              |                                  ORDER BY bkt) AS grp
              |  FROM pb),
              |lens AS (
              |  SELECT veh_a, veh_b, CAST(count(*) AS BIGINT) AS len
              |  FROM runs GROUP BY veh_a, veh_b, grp
              |  HAVING count(*) >= 2)
              |SELECT veh_a, veh_b, CAST(count(*) AS BIGINT) AS n_convoys,
              |       CAST(max(len) AS BIGINT) AS max_len,
              |       CAST(sum(len) AS BIGINT) AS convoy_bkts
              |FROM lens GROUP BY 1, 2""".stripMargin)),

    // ── Mixture reweighting of documents toward a uniform 10-bucket
    //    length target, with the reweighted corpus's effective sample
    //    size as the headline cost metric.
    QueryDef("q_mix_reweight",
      (s, d) => Curation.mixReweight(
        Tables.documents(s, d)
          .select(least(expr("n_chars div 100"), lit(9L)).as("bucket")),
        10),
      Some("""WITH b AS (SELECT least(n_chars // 100, 9) AS bucket FROM documents),
             |bk AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM bk),
             |w AS (SELECT bucket, c, n,
             |             CAST(n * 1000000 // (10 * c) AS BIGINT) AS weight_e6
             |      FROM bk CROSS JOIN tot),
             |ess AS (SELECT CAST(sum(CAST(c AS HUGEINT) * weight_e6)
             |               * sum(CAST(c AS HUGEINT) * weight_e6) * 1000000
             |               // (CAST(max(n) AS HUGEINT)
             |                  * sum(CAST(c AS HUGEINT) * weight_e6 * weight_e6))
             |               AS BIGINT) AS ess_e6
             |        FROM w)
             |SELECT bucket, c, CAST(c * 1000000 // n AS BIGINT) AS share_e6,
             |       weight_e6, ess_e6
             |FROM w CROSS JOIN ess""".stripMargin)),

    // ── MDE sizing per order-priority segment over total-price cents:
    //    what lift a 50/50 split on this segment could detect at
    //    α=.05 / 80% power.
    QueryDef("q_mde",
      (s, d) => Experiment.mde(
        Tables.orders(s, d).select(col("o_orderpriority").as("seg"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents")),
        "seg", "cents"),
      Some("""WITH o AS (SELECT o_orderpriority AS seg,
             |                 CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT) AS v
             |          FROM orders),
             |m AS (SELECT seg, CAST(count(*) AS HUGEINT) AS n,
             |             sum(v) AS s, sum(v * v) AS q
             |      FROM o GROUP BY 1),
             |e AS (SELECT seg, n, s,
             |             CAST(n * q - s * s AS DOUBLE)
             |               / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS var0
             |      FROM m),
             |f AS (SELECT seg, CAST(n AS BIGINT) AS n,
             |             CAST(s // n AS BIGINT) AS mean_cents,
             |             CAST(CASE WHEN n < 4 OR var0 <= 0 THEN NULL
             |                  ELSE floor(CAST('2.801585' AS DOUBLE)
             |                       * sqrt(CAST('4' AS DOUBLE) * var0
             |                              / CAST(n AS DOUBLE))
             |                       + CAST('0.5' AS DOUBLE)) END AS BIGINT)
             |               AS mde_cents
             |      FROM e)
             |SELECT seg, n, mean_cents, mde_cents,
             |       CASE WHEN mde_cents IS NULL OR mean_cents = 0 THEN NULL
             |            ELSE mde_cents * 1000000 // mean_cents
             |       END AS mde_rel_e6
             |FROM f""".stripMargin))
  )
}
