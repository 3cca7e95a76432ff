package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-149 batch: bucketed spatial analytics over an exact-integer
  * synthetic trajectory (coords derive from (user_id, event_id) by
  * modular arithmetic — no floats anywhere, so every distance and
  * heading is bit-exact cross-engine):
  *
  *  - grid-bucketed k-nearest-neighbor JOIN (each probe point's top-3
  *    neighbors among the 3×3 adjacent-cell candidates — the canonical
  *    scale shape for spatial KNN: candidate count is bounded by cell
  *    density, never all-pairs);
  *  - KNN regression audit (predict each probe's value from its
  *    neighbors' mean; report per-probe absolute error) — the lazy-
  *    learner accuracy check a feature-store pipeline runs;
  *  - heading octants (movement direction classified into 8 sectors by
  *    integer sign/magnitude comparisons — no trig — then a per-
  *    provider directional histogram).
  *
  * Coordinates: la = (user_id·37 + event_id·13) mod 17000, lo =
  * (user_id·91 + event_id·29) mod 35000 — kept non-negative so `div`
  * grid snapping truncates identically in Spark and DuckDB.
  */
object Round149Queries {

  private val laExpr = "(user_id * 37 + event_id * 13) % 17000"
  private val loExpr = "(user_id * 91 + event_id * 29) % 35000"

  /** Probe predicate: ~1 in 3000 events serve as KNN query points. */
  private val probeExpr = "event_id % 2999 = 1"

  def defs: Seq[QueryDef] = Seq(

    // ── Grid-bucketed 3-NN join: cells are 500×500 units; candidates
    //    come ONLY from the probe's 3×3 cell neighborhood (exact for
    //    any true neighbor within 500 units; documented bucketed
    //    semantics beyond that). Ties break on (d2, neighbor id).
    QueryDef("q_knn_grid_join",
      (s, d) => {
        val pts = Tables.events(s, d)
          .selectExpr("event_id", s"$laExpr AS la", s"$loExpr AS lo")
          .selectExpr("event_id", "la", "lo",
            "la div 500 AS cx", "lo div 500 AS cy")
          .localCheckpoint(false)
        val probes = pts.filter(expr(probeExpr))
        val offsets = expr(
          "explode(transform(sequence(0, 8), i -> named_struct(" +
            "'dx', i div 3 - 1, 'dy', i % 3 - 1)))")
        val cand = probes
          .select(col("event_id").as("qid"), col("la").as("qla"),
            col("lo").as("qlo"), col("cx"), col("cy"))
          .select(col("qid"), col("qla"), col("qlo"), offsets.as("o"),
            col("cx"), col("cy"))
          .select(col("qid"), col("qla"), col("qlo"),
            (col("cx") + col("o.dx")).as("cx"),
            (col("cy") + col("o.dy")).as("cy"))
          .join(pts.select(col("event_id").as("nid"), col("la"), col("lo"),
            col("cx"), col("cy")), Seq("cx", "cy"))
          .filter(col("nid") =!= col("qid"))
          .select(col("qid"), col("nid"),
            ((col("qla") - col("la")) * (col("qla") - col("la")) +
              (col("qlo") - col("lo")) * (col("qlo") - col("lo")))
              .as("d2"))
        import org.apache.spark.sql.expressions.Window
        cand.withColumn("nn_rank",
            row_number().over(Window.partitionBy(col("qid"))
              .orderBy(col("d2"), col("nid"))).cast("long"))
          .filter(col("nn_rank") <= 3)
          .select(col("qid").as("event_id"), col("nn_rank"),
            col("nid").as("nbr_event_id"), col("d2"))
      },
      Some(s"""WITH pts AS (
              |  SELECT event_id, $laExpr AS la, $loExpr AS lo,
              |         ($laExpr) // 500 AS cx, ($loExpr) // 500 AS cy
              |  FROM events),
              |probes AS (SELECT * FROM pts WHERE $probeExpr),
              |offs AS (SELECT dx, dy
              |         FROM (VALUES (-1), (0), (1)) a(dx)
              |         CROSS JOIN (VALUES (-1), (0), (1)) b(dy)),
              |cand AS (
              |  SELECT q.event_id AS qid, p.event_id AS nid,
              |         (q.la - p.la) * (q.la - p.la)
              |           + (q.lo - p.lo) * (q.lo - p.lo) AS d2
              |  FROM probes q CROSS JOIN offs o
              |  JOIN pts p ON p.cx = q.cx + o.dx AND p.cy = q.cy + o.dy
              |  WHERE p.event_id <> q.event_id)
              |SELECT qid AS event_id,
              |       CAST(row_number() OVER (PARTITION BY qid
              |         ORDER BY d2, nid) AS BIGINT) AS nn_rank,
              |       nid AS nbr_event_id, d2
              |FROM cand
              |QUALIFY nn_rank <= 3""".stripMargin)),

    // ── KNN regression audit: predict each probe's cents from the mean
    //    of its ≤3 bucketed nearest neighbors; emit per-probe counts,
    //    prediction, and absolute error. Same candidate construction as
    //    q_knn_grid_join (the shared scale story: density-bounded).
    QueryDef("q_knn_regress",
      (s, d) => {
        val pts = Tables.events(s, d)
          .selectExpr("event_id",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
            s"$laExpr AS la", s"$loExpr AS lo")
          .selectExpr("event_id", "cents", "la", "lo",
            "la div 500 AS cx", "lo div 500 AS cy")
          .localCheckpoint(false)
        val probes = pts.filter(expr(probeExpr))
        val offsets = expr(
          "explode(transform(sequence(0, 8), i -> named_struct(" +
            "'dx', i div 3 - 1, 'dy', i % 3 - 1)))")
        val cand = probes
          .select(col("event_id").as("qid"), col("cents").as("qc"),
            col("la").as("qla"), col("lo").as("qlo"), col("cx"), col("cy"))
          .select(col("qid"), col("qc"), col("qla"), col("qlo"),
            offsets.as("o"), col("cx"), col("cy"))
          .select(col("qid"), col("qc"),
            (col("cx") + col("o.dx")).as("cx"),
            (col("cy") + col("o.dy")).as("cy"),
            col("qla"), col("qlo"))
          .join(pts.select(col("event_id").as("nid"), col("cents"),
            col("la"), col("lo"), col("cx"), col("cy")), Seq("cx", "cy"))
          .filter(col("nid") =!= col("qid"))
          .select(col("qid"), col("qc"), col("nid"), col("cents"),
            ((col("qla") - col("la")) * (col("qla") - col("la")) +
              (col("qlo") - col("lo")) * (col("qlo") - col("lo")))
              .as("d2"))
        import org.apache.spark.sql.expressions.Window
        cand.withColumn("nn_rank",
            row_number().over(Window.partitionBy(col("qid"))
              .orderBy(col("d2"), col("nid"))))
          .filter(col("nn_rank") <= 3)
          .groupBy(col("qid"))
          .agg(max(col("qc")).as("own_cents"),
            count(lit(1)).as("n_nbrs"), sum(col("cents")).as("sc"))
          .selectExpr("qid AS event_id", "own_cents",
            "CAST(n_nbrs AS BIGINT) AS n_nbrs",
            "sc div n_nbrs AS pred_cents",
            "abs(own_cents - sc div n_nbrs) AS abs_err_cents")
      },
      Some(s"""WITH pts AS (
              |  SELECT event_id,
              |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
              |         $laExpr AS la, $loExpr AS lo,
              |         ($laExpr) // 500 AS cx, ($loExpr) // 500 AS cy
              |  FROM events),
              |probes AS (SELECT * FROM pts WHERE $probeExpr),
              |offs AS (SELECT dx, dy
              |         FROM (VALUES (-1), (0), (1)) a(dx)
              |         CROSS JOIN (VALUES (-1), (0), (1)) b(dy)),
              |cand AS (
              |  SELECT q.event_id AS qid, q.cents AS qc,
              |         p.event_id AS nid, p.cents,
              |         (q.la - p.la) * (q.la - p.la)
              |           + (q.lo - p.lo) * (q.lo - p.lo) AS d2
              |  FROM probes q CROSS JOIN offs o
              |  JOIN pts p ON p.cx = q.cx + o.dx AND p.cy = q.cy + o.dy
              |  WHERE p.event_id <> q.event_id),
              |nn AS (SELECT qid, qc, nid, cents
              |       FROM cand
              |       QUALIFY row_number() OVER (PARTITION BY qid
              |         ORDER BY d2, nid) <= 3),
              |a AS (SELECT qid, max(qc) AS own_cents,
              |             CAST(count(*) AS BIGINT) AS n_nbrs,
              |             CAST(sum(cents) AS BIGINT) AS sc
              |      FROM nn GROUP BY 1)
              |SELECT qid AS event_id, own_cents, n_nbrs,
              |       sc // n_nbrs AS pred_cents,
              |       abs(own_cents - sc // n_nbrs) AS abs_err_cents
              |FROM a""".stripMargin)),

    // ── Heading octants: consecutive-event displacement per user,
    //    classified into 8 directional sectors by integer sign and
    //    |dla| vs |dlo| comparisons (boundaries assigned by the CASE
    //    order — identical text both engines); per-provider histogram
    //    with e6 shares. One user-keyed window + one bounded rollup.
    QueryDef("q_heading_octants",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val moves = Tables.events(s, d)
          .selectExpr("user_id", "ts", "event_id",
            s"$laExpr AS la", s"$loExpr AS lo",
            "concat('p', CAST(user_id % 3 AS STRING)) AS provider")
          .withColumn("dla", col("la") - lag(col("la"), 1).over(w))
          .withColumn("dlo", col("lo") - lag(col("lo"), 1).over(w))
          .filter(col("dla").isNotNull)
          .selectExpr("provider",
            """CASE
              |  WHEN dla = 0 AND dlo = 0 THEN 'stay'
              |  WHEN dlo > 0 AND dla >= 0 AND dlo >= dla THEN 'E'
              |  WHEN dla > 0 AND dlo >= 0 AND dla > dlo THEN 'NE_N'
              |  WHEN dla > 0 AND dlo < 0 AND dla >= -dlo THEN 'N_NW'
              |  WHEN dlo < 0 AND dla >= 0 AND -dlo > dla THEN 'W_hi'
              |  WHEN dlo < 0 AND dla < 0 AND -dlo >= -dla THEN 'W_lo'
              |  WHEN dla < 0 AND dlo <= 0 AND -dla > -dlo THEN 'SW_S'
              |  WHEN dla < 0 AND dlo > 0 AND -dla >= dlo THEN 'S_SE'
              |  ELSE 'SE_E'
              |END AS octant""".stripMargin)
        val counts = moves.groupBy(col("provider"), col("octant"))
          .agg(count(lit(1)).as("n"))
        val tot = counts.groupBy(col("provider"))
          .agg(sum(col("n")).as("tn"))
        counts.join(tot, "provider")
          .selectExpr("provider", "octant", "CAST(n AS BIGINT) AS n",
            "n * 1000000 div tn AS share_e6")
      },
      Some(s"""WITH m AS (
              |  SELECT concat('p', CAST(user_id % 3 AS VARCHAR)) AS provider,
              |         $laExpr - lag($laExpr) OVER w AS dla,
              |         $loExpr - lag($loExpr) OVER w AS dlo
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              |c AS (
              |  SELECT provider,
              |         CASE
              |           WHEN dla = 0 AND dlo = 0 THEN 'stay'
              |           WHEN dlo > 0 AND dla >= 0 AND dlo >= dla THEN 'E'
              |           WHEN dla > 0 AND dlo >= 0 AND dla > dlo THEN 'NE_N'
              |           WHEN dla > 0 AND dlo < 0 AND dla >= -dlo THEN 'N_NW'
              |           WHEN dlo < 0 AND dla >= 0 AND -dlo > dla THEN 'W_hi'
              |           WHEN dlo < 0 AND dla < 0 AND -dlo >= -dla THEN 'W_lo'
              |           WHEN dla < 0 AND dlo <= 0 AND -dla > -dlo THEN 'SW_S'
              |           WHEN dla < 0 AND dlo > 0 AND -dla >= dlo THEN 'S_SE'
              |           ELSE 'SE_E'
              |         END AS octant
              |  FROM m WHERE dla IS NOT NULL),
              |cnt AS (SELECT provider, octant, CAST(count(*) AS BIGINT) AS n
              |        FROM c GROUP BY 1, 2),
              |tot AS (SELECT provider, CAST(sum(n) AS BIGINT) AS tn
              |        FROM cnt GROUP BY 1)
              |SELECT cnt.provider, cnt.octant, cnt.n,
              |       cnt.n * 1000000 // tot.tn AS share_e6
              |FROM cnt JOIN tot ON cnt.provider = tot.provider"""
        .stripMargin))
  )
}
