package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-67 batch: greedy influence-maximization seeds (3-step marginal
  * coverage — the seeding decision q_pagerank ranks but never commits
  * to), a gravity-model fit of the origin–destination matrix (expected
  * vs observed flows — the spatial-interaction baseline over
  * q_od_matrix's raw counts), and a rendezvous-hashing rebalance audit
  * (how many keys move when a node joins — the minimal-disruption
  * placement story behind q_split_assign).
  */
object Round67Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Influence seeds: greedy max-marginal-coverage on the closed
    //    neighborhoods of the event digraph, 3 unrolled steps.
    QueryDef("q_influence_seeds",
      (s, d) => {
        val und = Tables.events(s, d)
          .select(least(col("user_id") % 500, col("event_id") % 500).as("a"),
            greatest(col("user_id") % 500, col("event_id") % 500).as("b"))
          .where(col("a") =!= col("b")).distinct()
        val nodes = und.select(col("a").as("v"))
          .union(und.select(col("b").as("v"))).distinct()
        val adj = und.select(col("a").as("v"), col("b").as("n"))
          .unionByName(und.select(col("b").as("v"), col("a").as("n")))
          .unionByName(nodes.select(col("v"), col("v").as("n")))
          .localCheckpoint(false) // reused by all 3 greedy steps
        var covered = adj.sparkSession.emptyDataFrame
          .sparkSession.range(0).select(col("id").as("n"))
        var out: org.apache.spark.sql.DataFrame = null
        var coveredCount = 0L
        for (step <- 1 to 3) {
          val gain = adj.join(covered, Seq("n"), "left_anti")
            .groupBy(col("v")).agg(count(lit(1)).as("gain"))
            .withColumn("rk", row_number().over(
              Window.orderBy(col("gain").desc, col("v"))))
            .where(col("rk") === 1)
            .select(lit(step.toLong).as("step"), col("v").as("seed"),
              col("gain"))
            .localCheckpoint(false)
          val seedN = adj.join(
            gain.select(col("seed").as("v")), "v").select(col("n"))
          covered = covered.union(seedN).distinct().localCheckpoint(false)
          coveredCount = covered.count()
          val row = gain.withColumn("covered_total", lit(coveredCount))
          out = if (out == null) row else out.unionByName(row)
        }
        out
      },
      Some {
        def step(k: Int, prevCov: String) =
          s"""g$k AS (SELECT v, CAST(count(*) AS BIGINT) AS gain
             |        FROM adj WHERE n NOT IN (SELECT n FROM $prevCov)
             |        GROUP BY 1),
             |s$k AS (SELECT CAST($k AS BIGINT) AS step, v AS seed, gain
             |        FROM (SELECT *, row_number() OVER (ORDER BY gain DESC,
             |                v) AS rk FROM g$k)
             |        WHERE rk = 1),
             |cov$k AS (SELECT n FROM cov${k - 1}
             |          UNION SELECT adj.n FROM adj JOIN s$k
             |                ON adj.v = s$k.seed),
             |r$k AS (SELECT step, seed, gain,
             |               (SELECT CAST(count(*) AS BIGINT) FROM cov$k)
             |                 AS covered_total
             |        FROM s$k)""".stripMargin
        s"""WITH und AS (
           |  SELECT DISTINCT least(user_id % 500, event_id % 500) AS a,
           |         greatest(user_id % 500, event_id % 500) AS b
           |  FROM events WHERE user_id % 500 <> event_id % 500),
           |nodes AS (SELECT a AS v FROM und UNION SELECT b FROM und),
           |adj AS MATERIALIZED (
           |  SELECT a AS v, b AS n FROM und
           |  UNION ALL SELECT b, a FROM und
           |  UNION ALL SELECT v, v FROM nodes),
           |cov0(n) AS (SELECT CAST(NULL AS BIGINT) WHERE 1 = 0),
           |${step(1, "cov0")},
           |${step(2, "cov1")},
           |${step(3, "cov2")}
           |SELECT * FROM r1 UNION ALL SELECT * FROM r2
           |UNION ALL SELECT * FROM r3""".stripMargin
      }),

    // ── Gravity model: observed per-user consecutive-cell-band flows vs
    //    K·w_o·w_d/d² expectations (7×7 band grid, decimal-normalized).
    QueryDef("q_od_gravity",
      (s, d) => {
        val dec = "decimal(38,0)"
        val pts = Tables.events(s, d).select(col("user_id").as("u"),
          expr("unix_micros(ts)").as("t"), col("event_id").as("eid"),
          expr("((event_id * 91 % 35000) div 50) div 100").as("band"))
        val w = Window.partitionBy(col("u")).orderBy(col("t"), col("eid"))
        val obs = pts.withColumn("o", lag(col("band"), 1).over(w))
          .where(col("o").isNotNull)
          .groupBy(col("o"), col("band").as("dst"))
          .agg(count(lit(1)).as("obs"))
          .localCheckpoint(false) // reused: margins + normalization + fit
        val wo = obs.groupBy(col("o")).agg(sum(col("obs")).as("wo"))
        val wd = obs.groupBy(col("dst")).agg(sum(col("obs")).as("wd"))
        val tot = obs.agg(sum(col("obs")).as("tot"))
        val m = obs.join(broadcast(wo), "o").join(broadcast(wd), "dst")
          .withColumn("d2", expr("(abs(o - dst) + 1) * (abs(o - dst) + 1)"))
          .withColumn("m", expr("wo * wd * 1000000 div d2"))
        val sm = m.agg(sum(col("m").cast(dec)).as("sm"))
        m.crossJoin(broadcast(sm)).crossJoin(broadcast(tot))
          .selectExpr("o AS origin", "dst", "obs",
            s"CAST(CAST(tot AS $dec) * CAST(m AS $dec) * 1000000" +
              s" div CAST(sm AS $dec) AS BIGINT) AS exp_e6",
            s"obs * 1000000 - CAST(CAST(tot AS $dec) * CAST(m AS $dec)" +
              s" * 1000000 div CAST(sm AS $dec) AS BIGINT) AS resid_e6")
      },
      Some("""WITH pts AS (
             |  SELECT user_id AS u, epoch_us(ts) AS t, event_id AS eid,
             |         ((event_id * 91 % 35000) // 50) // 100 AS band
             |  FROM events),
             |seq AS (SELECT u, band,
             |               lag(band) OVER (PARTITION BY u
             |                 ORDER BY t, eid) AS o
             |        FROM pts),
             |obs AS (SELECT o, band AS dst, CAST(count(*) AS BIGINT) AS obs
             |        FROM seq WHERE o IS NOT NULL GROUP BY 1, 2),
             |wo AS (SELECT o, CAST(sum(obs) AS BIGINT) AS wo
             |       FROM obs GROUP BY 1),
             |wd AS (SELECT dst, CAST(sum(obs) AS BIGINT) AS wd
             |       FROM obs GROUP BY 1),
             |tot AS (SELECT CAST(sum(obs) AS HUGEINT) AS tot FROM obs),
             |m AS (SELECT obs.o, obs.dst, obs.obs,
             |             CAST(wo AS HUGEINT) * CAST(wd AS HUGEINT)
             |               * 1000000
             |               // ((abs(obs.o - obs.dst) + 1)
             |                  * (abs(obs.o - obs.dst) + 1)) AS m
             |      FROM obs JOIN wo ON obs.o = wo.o
             |           JOIN wd ON obs.dst = wd.dst),
             |sm AS (SELECT sum(m) AS sm FROM m)
             |SELECT o AS origin, dst, obs,
             |       CAST(tot * m * 1000000 // sm AS BIGINT) AS exp_e6,
             |       obs * 1000000 - CAST(tot * m * 1000000 // sm AS BIGINT)
             |         AS resid_e6
             |FROM m CROSS JOIN sm CROSS JOIN tot""".stripMargin)),

    // ── Rendezvous rebalance: highest-random-weight placement of user
    //    keys on 4 vs 5 nodes; the node-join disruption readout.
    QueryDef("q_rendezvous_rebalance",
      (s, d) => {
        val keys = Tables.events(s, d).select(col("user_id").as("u"))
          .distinct()
        val nodes = keys.sparkSession.range(5).select(col("id").as("node"))
        val scored = keys.crossJoin(broadcast(nodes))
          .withColumn("h", Dedup.hash48(
            concat(col("u").cast("string"), lit("#"),
              col("node").cast("string")), lit("rdv")))
        def assign(n: Int) = scored.where(col("node") < n)
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("u"))
              .orderBy(col("h").desc, col("node"))))
          .where(col("rk") === 1)
          .select(col("u"), col("node").as(s"a$n"))
        val j = assign(4).join(assign(5), "u")
          .localCheckpoint(false) // reused: per-node loads + move total
        val moves = j.agg(count(lit(1)).as("n_keys"),
          sum(when(col("a4") =!= col("a5"), 1L).otherwise(0L)).as("moved"))
        val perNode = j.groupBy(col("a5").as("node"))
          .agg(count(lit(1)).as("load_n5"))
          .join(j.groupBy(col("a4").as("node"))
            .agg(count(lit(1)).as("load_n4")), Seq("node"), "left")
        perNode.crossJoin(broadcast(moves))
          .selectExpr("node", "coalesce(load_n4, CAST(0 AS BIGINT)) AS load_n4",
            "load_n5", "n_keys", "moved",
            "moved * 1000000 div n_keys AS moved_e6")
      },
      Some {
        val h = PortableSql.hash48("concat(CAST(u AS VARCHAR), '#', " +
          "CAST(node AS VARCHAR))", "'rdv'")
        s"""WITH keys AS (SELECT DISTINCT user_id AS u FROM events),
           |scored AS (
           |  SELECT u, CAST(n.range AS BIGINT) AS node, $h AS h
           |  FROM keys CROSS JOIN range(5) n),
           |a4 AS (SELECT u, node AS a4 FROM (
           |         SELECT u, node, row_number() OVER (PARTITION BY u
           |           ORDER BY h DESC, node) AS rk
           |         FROM scored WHERE node < 4) WHERE rk = 1),
           |a5 AS (SELECT u, node AS a5 FROM (
           |         SELECT u, node, row_number() OVER (PARTITION BY u
           |           ORDER BY h DESC, node) AS rk
           |         FROM scored WHERE node < 5) WHERE rk = 1),
           |j AS (SELECT a4.u, a4.a4, a5.a5 FROM a4 JOIN a5 ON a4.u = a5.u),
           |mv AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
           |              CAST(sum(CASE WHEN a4 <> a5 THEN 1 ELSE 0 END)
           |                AS BIGINT) AS moved
           |       FROM j),
           |pn AS (SELECT n5.node, coalesce(load_n4, 0) AS load_n4, load_n5
           |       FROM (SELECT a5 AS node, CAST(count(*) AS BIGINT)
           |               AS load_n5 FROM j GROUP BY 1) n5
           |       LEFT JOIN (SELECT a4 AS node, CAST(count(*) AS BIGINT)
           |               AS load_n4 FROM j GROUP BY 1) n4
           |         ON n5.node = n4.node)
           |SELECT node, load_n4, load_n5, n_keys, moved,
           |       moved * 1000000 // n_keys AS moved_e6
           |FROM pn CROSS JOIN mv""".stripMargin
      })
  )
}
