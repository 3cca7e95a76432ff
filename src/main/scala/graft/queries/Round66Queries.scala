package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Graph
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-66 batch: Goertzel periodicity power (single-bin DFT at 1/2/3
  * cycles-per-day over the hour-of-day profile, via a literal e6
  * cosine table — the spectral reading q_acf/q_seasonal_strength take
  * in the time domain), DAG critical-path slack (earliest/latest start
  * per node, slack-0 = the critical path q_dag_longest only measures
  * end-to-end), and pinball-loss evaluation of split-fit quantile
  * predictors (the proper scoring rule for q_weighted_quantile-style
  * forecasts).
  */
object Round66Queries {

  /** cos(m·15°)·1e6, m = 0..23 — shared literal table; sin(m·15°) =
    * cos((m+18)·15°). */
  private val cosT = Seq(1000000L, 965926L, 866025L, 707107L, 500000L,
    258819L, 0L, -258819L, -500000L, -707107L, -866025L, -965926L,
    -1000000L, -965926L, -866025L, -707107L, -500000L, -258819L, 0L,
    258819L, 500000L, 707107L, 866025L, 965926L)

  private def caseFor(idx: String, shift: Int): String =
    "CASE " + cosT.indices.map { m =>
      s"WHEN ($idx + $shift) % 24 = $m THEN ${cosT(m)}"
    }.mkString(" ") + " ELSE 0 END"

  def defs: Seq[QueryDef] = Seq(

    // ── Goertzel: power of the hour-of-day count profile at 1, 2 and 3
    //    cycles/day. Everything after the 24-row profile is literal
    //    integer arithmetic.
    QueryDef("q_goertzel_power",
      (s, d) => {
        val dec = "decimal(38,0)"
        val prof = Tables.events(s, d)
          .select(expr("(unix_micros(ts) div 3600000000) % 24").as("hod"))
          .groupBy(col("hod")).agg(count(lit(1)).as("c"))
        val freqs = s.range(1, 4).select(col("id").as("freq"))
        prof.crossJoin(broadcast(freqs))
          .withColumn("idx", expr("(freq * hod) % 24"))
          .withColumn("cosv", expr(caseFor("idx", 0)))
          .withColumn("sinv", expr(caseFor("idx", 18)))
          .groupBy(col("freq"))
          .agg(sum(expr("c * cosv")).cast(dec).as("sc"),
            sum(expr("c * sinv")).cast(dec).as("ss"),
            sum(col("c")).as("n_events"))
          .selectExpr("freq", "n_events",
            "CAST(sc div 1000000 AS BIGINT) AS sc_e0",
            "CAST(ss div 1000000 AS BIGINT) AS ss_e0",
            "CAST((sc * sc + ss * ss) div 1000000000000 AS BIGINT) AS power")
      },
      Some {
        s"""WITH prof AS (
           |  SELECT (epoch_us(ts) // 3600000000) % 24 AS hod,
           |         CAST(count(*) AS BIGINT) AS c
           |  FROM events GROUP BY 1),
           |g AS (SELECT f.range AS freq, hod, c,
           |             (f.range * hod) % 24 AS idx
           |      FROM prof CROSS JOIN range(1, 4) f),
           |t AS (SELECT freq, c,
           |             ${caseFor("idx", 0)} AS cosv,
           |             ${caseFor("idx", 18)} AS sinv
           |      FROM g),
           |a AS (SELECT freq, CAST(sum(c * cosv) AS HUGEINT) AS sc,
           |             CAST(sum(c * sinv) AS HUGEINT) AS ss,
           |             CAST(sum(c) AS BIGINT) AS n_events
           |      FROM t GROUP BY 1)
           |SELECT CAST(freq AS BIGINT) AS freq, n_events,
           |       CAST(${sdivSql("sc", "1000000")} AS BIGINT) AS sc_e0,
           |       CAST(${sdivSql("ss", "1000000")} AS BIGINT) AS ss_e0,
           |       CAST((sc * sc + ss * ss) // 1000000000000 AS BIGINT)
           |         AS power
           |FROM a""".stripMargin
      }),

    // ── Critical slack: ES via forward longest paths, tail length via
    //    reversed longest paths; slack 0 marks the critical path.
    QueryDef("q_critical_slack",
      (s, d) => {
        val nodes = Tables.part(s, d)
          .select((col("p_partkey") % 100).as("id")).distinct()
        val chain = nodes.filter(col("id") % 10 =!= 9)
          .select(col("id").as("src"), (col("id") + 1).as("dst"))
        val c1 = nodes.filter(col("id") % 10 === 0)
          .select(col("id").as("src"), (col("id") + 4).as("dst"))
        val c2 = nodes.filter(col("id") % 10 === 4 &&
            expr("(id div 10) % 2") === 0)
          .select(col("id").as("src"), (col("id") + 5).as("dst"))
        val e = chain.unionByName(c1).unionByName(c2).distinct()
          .withColumn("w", col("dst") - col("src"))
          .localCheckpoint(false) // feeds both direction legs below
        // r12: ONE dagLongestPath run carries BOTH directions — the
        // reversed graph lives on ids offset by 1000 (node ids are
        // p_partkey % 100 < 100), so the relaxation rounds of the two
        // sweeps share every frontier join and the round count is
        // max(fwd, bwd) instead of fwd + bwd (guide §2.4; the q_bowtie
        // parity-fusion trick on the offset encoding).
        val both = Graph.dagLongestPath(
          nodes.select(col("id"))
            .unionByName(nodes.select((col("id") + 1000L).as("id"))),
          e.select(col("src"), col("dst"), col("w"))
            .unionByName(e.select((col("dst") + 1000L).as("src"),
              (col("src") + 1000L).as("dst"), col("w"))),
          10).localCheckpoint(false)
        val es = both.filter(col("id") < 1000L)
          .select(col("id"), col("dist").as("es"))
        val tail = both.filter(col("id") >= 1000L)
          .select((col("id") - 1000L).as("id"), col("dist").as("tail_len"))
        val j = es.join(tail, "id")
        val hz = j.agg(max(col("es") + col("tail_len")).as("horizon"))
        j.crossJoin(broadcast(hz))
          .selectExpr("id", "es", "tail_len", "horizon",
            "horizon - es - tail_len AS slack",
            "horizon - es - tail_len = 0 AS critical")
      },
      Some("""WITH RECURSIVE
             |nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
             |ce AS (
             |  SELECT id AS src, id + 1 AS dst FROM nodes WHERE id % 10 <> 9
             |  UNION SELECT id, id + 4 FROM nodes WHERE id % 10 = 0
             |  UNION SELECT id, id + 5 FROM nodes
             |        WHERE id % 10 = 4 AND (id // 10) % 2 = 0),
             |e AS (SELECT src, dst, dst - src AS w FROM ce),
             |fwd(v, dd) AS (
             |  SELECT id, CAST(0 AS BIGINT) FROM nodes
             |  UNION
             |  SELECT e.dst, f.dd + e.w FROM fwd f JOIN e ON e.src = f.v),
             |bwd(v, dd) AS (
             |  SELECT id, CAST(0 AS BIGINT) FROM nodes
             |  UNION
             |  SELECT e.src, b.dd + e.w FROM bwd b JOIN e ON e.dst = b.v),
             |es AS (SELECT v AS id, max(dd) AS es FROM fwd GROUP BY 1),
             |tl AS (SELECT v AS id, max(dd) AS tail_len FROM bwd GROUP BY 1),
             |j AS (SELECT es.id, es.es, tl.tail_len
             |      FROM es JOIN tl ON es.id = tl.id),
             |hz AS (SELECT max(es + tail_len) AS horizon FROM j)
             |SELECT CAST(id AS BIGINT) AS id, es, tail_len, horizon,
             |       horizon - es - tail_len AS slack,
             |       horizon - es - tail_len = 0 AS critical
             |FROM j CROSS JOIN hz""".stripMargin)),

    // ── Pinball loss: quartile predictors fit on even custkeys per
    //    segment, scored on odd custkeys; all integer e2 units.
    QueryDef("q_pinball_loss",
      (s, d) => {
        val units = Tables.customer(s, d)
          .select(col("c_mktsegment").as("seg"), col("c_custkey").as("ck"),
            floor(col("c_acctbal") * 100 + 0.5).cast("long").as("v"))
          .localCheckpoint(false) // reused: fit + eval split
        val fit = units.where(col("ck") % 2 === 0)
        val win = Window.partitionBy(col("seg")).orderBy(col("v"), col("ck"))
        val ranked = fit
          .withColumn("r", row_number().over(win).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("seg"))))
        val preds = Seq(1, 2, 3).map { k =>
          ranked.where(col("r") * 4 >= col("n") * k)
            .withColumn("pk", row_number().over(win))
            .where(col("pk") === 1)
            .select(col("seg"), lit(k.toLong * 25).as("tau"),
              col("v").as("q_cents"))
        }.reduce(_ unionByName _)
        units.where(col("ck") % 2 =!= 0)
          .join(broadcast(preds), "seg")
          .withColumn("loss_e2",
            when(col("v") >= col("q_cents"),
              col("tau") * (col("v") - col("q_cents")))
              .otherwise((lit(100L) - col("tau"))
                * (col("q_cents") - col("v"))))
          .groupBy(col("seg"), col("tau"), col("q_cents"))
          .agg(count(lit(1)).as("n_eval"),
            expr("sum(loss_e2) div count(1)").as("mean_pinball_e2"))
      },
      Some {
        def pick(k: Int) =
          s"""SELECT seg, CAST(${k * 25} AS BIGINT) AS tau, v AS q_cents
             |FROM (SELECT seg, v,
             |             row_number() OVER (PARTITION BY seg
             |               ORDER BY v, ck) AS pk
             |      FROM ranked WHERE r * 4 >= n * $k)
             |WHERE pk = 1""".stripMargin
        s"""WITH units AS (
           |  SELECT c_mktsegment AS seg, c_custkey AS ck,
           |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
           |  FROM customer),
           |ranked AS (
           |  SELECT seg, ck, v,
           |         CAST(row_number() OVER (PARTITION BY seg
           |           ORDER BY v, ck) AS BIGINT) AS r,
           |         CAST(count(*) OVER (PARTITION BY seg) AS BIGINT) AS n
           |  FROM units WHERE ck % 2 = 0),
           |preds AS (${Seq(1, 2, 3).map(pick).mkString("\nUNION ALL\n")}),
           |ev AS (SELECT u.seg, p.tau, p.q_cents,
           |              CASE WHEN u.v >= p.q_cents
           |                   THEN p.tau * (u.v - p.q_cents)
           |                   ELSE (100 - p.tau) * (p.q_cents - u.v)
           |              END AS loss_e2
           |       FROM units u JOIN preds p ON u.seg = p.seg
           |       WHERE u.ck % 2 <> 0)
           |SELECT seg, tau, q_cents, CAST(count(*) AS BIGINT) AS n_eval,
           |       CAST(sum(loss_e2) // count(*) AS BIGINT)
           |         AS mean_pinball_e2
           |FROM ev GROUP BY 1, 2, 3""".stripMargin
      })
  )

  /** Sign-factored `//` for the oracle (HUGEINT operands may be
    * negative: sc/ss carry the profile's phase). */
  private def sdivSql(v: String, dv: String): String =
    s"(CASE WHEN ($v) >= 0 THEN ($v) // ($dv) ELSE -((-($v)) // ($dv)) END)"
}
