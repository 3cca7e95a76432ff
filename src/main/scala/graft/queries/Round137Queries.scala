package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-137 batch: event-stream capacity and affinity reads —
  * peak-to-mean ratio of the hourly profile per event type (the
  * provisioning headroom number; a flat profile ≈ 1e6, a spiky one ≫),
  * pairwise user-set Jaccard between event types (do the same people
  * click and purchase — the co-usage matrix), and type-affinity lift
  * (P(does B | did A) vs P(does B) over users — the behavioral
  * cross-sell read beside q_cooc_lift's basket form). Event-type and
  * hour axes are bounded; the only data-sized pass is one keyed
  * rollup per query.
  */
object Round137Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Peak-to-mean per type over the 24-hour profile: exact integer
    //    cross-multiply (peak·24 vs total), peak hour deterministic
    //    (max count, then min hour).
    QueryDef("q_peak_to_mean",
      (s, d) => {
        val prof = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("(unix_micros(ts) div 3600000000) % 24").as("hod"))
          .agg(count(lit(1)).as("c"))
        prof
          .withColumn("pk", max(col("c")).over(
            Window.partitionBy(col("event_type"))))
          .groupBy(col("event_type"))
          .agg(sum(col("c")).as("total"), max(col("c")).as("peak"),
            min(when(col("c") === col("pk"), col("hod"))).as("peak_hour"))
          .selectExpr("event_type", "CAST(total AS BIGINT) AS total",
            "CAST(peak AS BIGINT) AS peak",
            "CAST(peak_hour AS BIGINT) AS peak_hour",
            "peak * 24 * 1000000 div total AS peak_to_mean_e6")
      },
      Some("""WITH prof AS (
             |  SELECT event_type,
             |         (epoch_us(ts) // 3600000000) % 24 AS hod,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |mx AS (SELECT event_type,
             |              CAST(sum(c) AS BIGINT) AS total,
             |              CAST(max(c) AS BIGINT) AS peak
             |       FROM prof GROUP BY 1)
             |SELECT mx.event_type, mx.total, mx.peak,
             |       CAST(min(prof.hod) AS BIGINT) AS peak_hour,
             |       mx.peak * 24 * 1000000 // mx.total
             |         AS peak_to_mean_e6
             |FROM mx JOIN prof ON prof.event_type = mx.event_type
             |  AND prof.c = mx.peak
             |GROUP BY 1, 2, 3, mx.peak * 24 * 1000000 // mx.total"""
        .stripMargin)),

    // ── User-set Jaccard between event types: ONE (type, user)
    //    distinct, per-type sizes, then the user-keyed self-join feeds
    //    the 10-pair intersection counts — never an all-pairs user
    //    scan.
    QueryDef("q_user_overlap_types",
      (s, d) => {
        val tu = Tables.events(s, d)
          .select(col("event_type").as("t"), col("user_id").as("u"))
          .distinct()
          .localCheckpoint(false) // sizes + both sides of the self-join
        val sz = tu.groupBy(col("t")).agg(count(lit(1)).as("nu"))
        tu.as("a").join(tu.as("b"),
            col("a.u") === col("b.u") && col("a.t") < col("b.t"))
          .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
          .agg(count(lit(1)).as("ninter"))
          .join(broadcast(sz.select(col("t").as("ta"), col("nu").as("na"))),
            "ta")
          .join(broadcast(sz.select(col("t").as("tb"), col("nu").as("nb"))),
            "tb")
          .selectExpr("ta", "tb", "CAST(ninter AS BIGINT) AS ninter",
            "CAST(na AS BIGINT) AS na", "CAST(nb AS BIGINT) AS nb",
            "ninter * 1000000 div (na + nb - ninter) AS jaccard_e6")
      },
      Some("""WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u
             |            FROM events),
             |sz AS (SELECT t, CAST(count(*) AS BIGINT) AS nu
             |       FROM tu GROUP BY 1),
             |inter AS (SELECT a.t AS ta, b.t AS tb,
             |                 CAST(count(*) AS BIGINT) AS ninter
             |          FROM tu a JOIN tu b ON a.u = b.u AND a.t < b.t
             |          GROUP BY 1, 2)
             |SELECT ta, tb, ninter, za.nu AS na, zb.nu AS nb,
             |       ninter * 1000000 // (za.nu + zb.nu - ninter)
             |         AS jaccard_e6
             |FROM inter
             |JOIN sz za ON inter.ta = za.t
             |JOIN sz zb ON inter.tb = zb.t""".stripMargin)),

    // ── Type-affinity lift: over users, lift(A→B) = P(B|A)/P(B) =
    //    (n_AB · n_users) / (n_A · n_B) e6, all ordered pairs A≠B.
    //    Reuses the same distinct-user frame shape; the pair counts
    //    are symmetric but the lift matrix is emitted directed (the
    //    conditional read differs per direction only in its margin).
    QueryDef("q_type_affinity_lift",
      (s, d) => {
        val tu = Tables.events(s, d)
          .select(col("event_type").as("t"), col("user_id").as("u"))
          .distinct()
          .localCheckpoint(false) // margins + pair counts + user total
        val sz = tu.groupBy(col("t")).agg(count(lit(1)).as("nu"))
        val nus = tu.select(col("u")).distinct().agg(count(lit(1)).as("n"))
        tu.as("a").join(tu.as("b"),
            col("a.u") === col("b.u") && col("a.t") =!= col("b.t"))
          .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
          .agg(count(lit(1)).as("nab"))
          .join(broadcast(sz.select(col("t").as("ta"), col("nu").as("na"))),
            "ta")
          .join(broadcast(sz.select(col("t").as("tb"), col("nu").as("nb"))),
            "tb")
          .crossJoin(broadcast(nus))
          // decimal: nab·n·1e6 nears int64 at ~3M users — widen first.
          .selectExpr("ta", "tb", "CAST(nab AS BIGINT) AS nab",
            """CAST(CAST(nab AS DECIMAL(38,0)) * n * 1000000
              |div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)
              |AS lift_e6""".stripMargin)
      },
      Some("""WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u
             |            FROM events),
             |sz AS (SELECT t, CAST(count(*) AS BIGINT) AS nu
             |       FROM tu GROUP BY 1),
             |nus AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n
             |        FROM tu),
             |pr AS (SELECT a.t AS ta, b.t AS tb,
             |              CAST(count(*) AS BIGINT) AS nab
             |       FROM tu a JOIN tu b ON a.u = b.u AND a.t <> b.t
             |       GROUP BY 1, 2)
             |SELECT ta, tb, nab,
             |       CAST(CAST(nab AS HUGEINT) * n * 1000000
             |         // (CAST(za.nu AS HUGEINT) * zb.nu) AS BIGINT)
             |         AS lift_e6
             |FROM pr
             |JOIN sz za ON pr.ta = za.t
             |JOIN sz zb ON pr.tb = zb.t
             |CROSS JOIN nus""".stripMargin))
  )
}
