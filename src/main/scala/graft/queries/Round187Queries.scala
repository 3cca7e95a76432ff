package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-187 batch — heteroskedasticity diagnostics, clustering
  * tendency, and calibration error:
  *
  *  - Breusch–Pagan LM (`q_breusch_pagan`): do monthly-revenue OLS
  *    residuals grow with time? Residuals close per-row through IEEE
  *    doubles from exact BIGINT moments, are quantized per element
  *    (floor — the recipe's safe per-scalar op) to integer squared
  *    units, and the auxiliary e²-on-t regression is pure integer
  *    moments again; LM = n·R².
  *  - White test (`q_white_test`): the same auxiliary regression with
  *    regressors t AND t² — the 2×2 normal equations solved closed-form
  *    (determinant identities) from integer raw moments, df = 2.
  *  - Hopkins statistic (`q_hopkins`): clustering tendency of the
  *    embedding corpus — 16 hash-seeded synthetic uniform points in the
  *    per-dimension bounding box vs 16 real probes; H = Σu/(Σu+Σw)
  *    over nearest-neighbor squared distances (e3-quantized dims keep
  *    every sum in BIGINT). H → 1 clustered, → 0.5 uniform.
  *  - Split expected calibration error (`q_ece_split`): per-discount-band return
  *    rates fit on EVEN order keys, scored on ODD (q_ece bins one
  *    frame by confidence decile; this is the leakage-honest split
  *    twin) — ECE = Σ n_b·|acc_b
  *    − conf_b| div n plus the max-gap MCE, the q_log_loss companion
  *    every reliability audit pairs with.
  *
  * Scale shapes: month axes (≤ 80 rows), an 11-band table, and for
  * Hopkins one explode + a broadcast of 32 probe points against the
  * corpus — probes·|corpus| pairs, never corpus², with the dim
  * bounding box a 64-row broadcast. */
object Round187Queries {

  /** Monthly revenue axis (hecto-dollars) with 1-based index t. */
  private val monthAxisSql =
    """WITH mo AS (
      |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mk,
      |         CAST(sum(CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT))
      |           AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |ax AS (SELECT CAST(row_number() OVER (ORDER BY mk) AS BIGINT) AS t,
      |              y FROM mo)""".stripMargin

  private def monthAxis(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("mk"),
        expr("CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT)").as("h"))
      .groupBy(col("mk")).agg(sum(col("h")).as("y"))
      .withColumn("t", row_number().over(Window.orderBy(col("mk")))
        .cast("long"))
      .select(col("t"), col("y"))

  /** Per-row squared OLS residual of y on t, e²/10⁶-quantized — the
    * identical double expression both engines evaluate. */
  private val zExpr =
    """CAST(floor((CAST(y AS DOUBLE)
      |  - (CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * sxy
      |      - CAST(sx AS DOUBLE) * sy)
      |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |    * sx) / n
      |  - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * t)
      |  * (CAST(y AS DOUBLE)
      |  - (CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * sxy
      |      - CAST(sx AS DOUBLE) * sy)
      |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |    * sx) / n
      |  - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * t)
      |  / 1000000) AS BIGINT)""".stripMargin

  private val momentsSql =
    """m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(t) AS BIGINT) AS sx,
      |        CAST(sum(y) AS BIGINT) AS sy,
      |        CAST(sum(t * t) AS BIGINT) AS sxx,
      |        CAST(sum(t * y) AS BIGINT) AS sxy
      |      FROM ax)""".stripMargin

  /** e3-quantized embedding components keyed (vec_id, i), 1-based i. */
  private val compSql =
    """comp AS MATERIALIZED (
      |  SELECT vec_id,
      |         unnest(list_transform(CAST(embedding AS DOUBLE[]),
      |           x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))) AS v,
      |         unnest(range(1, len(embedding) + 1)) AS i
      |  FROM embeddings)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── Breusch–Pagan heteroskedasticity LM on the month axis.
    QueryDef("q_breusch_pagan",
      (s, d) => {
        val ax = monthAxis(s, d).localCheckpoint(false) // moments + z pass
        val m = ax.agg(count(lit(1)).as("n"), sum(col("t")).as("sx"),
          sum(col("y")).as("sy"), sum(col("t") * col("t")).as("sxx"),
          sum(col("t") * col("y")).as("sxy"))
        ax.crossJoin(broadcast(m))
          .selectExpr("n", "t", s"($zExpr) AS z")
          .groupBy(col("n"))
          .agg(sum(col("z")).as("sz"), sum(col("t") * col("z")).as("szt"),
            sum(col("z") * col("z")).as("szz"),
            sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"))
          .selectExpr("n",
            """CASE WHEN (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)
              |    * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)
              |    <= 0 THEN NULL
              |ELSE CAST(floor(n
              |  * ((CAST(n AS DOUBLE) * szt - CAST(st AS DOUBLE) * sz)
              |     * (CAST(n AS DOUBLE) * szt - CAST(st AS DOUBLE) * sz))
              |  / ((CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)
              |     * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz))
              |  * 1000000) AS BIGINT) END AS lm_e6""".stripMargin)
      },
      Some(monthAxisSql + ",\n" + momentsSql +
        s""",
           |zr AS (SELECT n, t, ($zExpr) AS z FROM ax CROSS JOIN m),
           |aux AS (SELECT n, CAST(sum(z) AS BIGINT) AS sz,
           |          CAST(sum(t * z) AS BIGINT) AS szt,
           |          CAST(sum(z * z) AS BIGINT) AS szz,
           |          CAST(sum(t) AS BIGINT) AS st,
           |          CAST(sum(t * t) AS BIGINT) AS stt
           |        FROM zr GROUP BY n)
           |SELECT n,
           |  CASE WHEN (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)
           |      * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)
           |      <= 0 THEN NULL
           |  ELSE CAST(floor(n
           |    * ((CAST(n AS DOUBLE) * szt - CAST(st AS DOUBLE) * sz)
           |       * (CAST(n AS DOUBLE) * szt - CAST(st AS DOUBLE) * sz))
           |    / ((CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)
           |       * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz))
           |    * 1000000) AS BIGINT) END AS lm_e6
           |FROM aux""".stripMargin)),

    // ── White test: auxiliary regression of e² on (t, t²), df = 2.
    QueryDef("q_white_test",
      (s, d) => {
        val ax = monthAxis(s, d).localCheckpoint(false)
        val m = ax.agg(count(lit(1)).as("n"), sum(col("t")).as("sx"),
          sum(col("y")).as("sy"), sum(col("t") * col("t")).as("sxx"),
          sum(col("t") * col("y")).as("sxy"))
        val aux = ax.crossJoin(broadcast(m))
          .selectExpr("n", "t", s"($zExpr) AS z")
          .groupBy(col("n"))
          .agg(sum(col("t")).as("st"),
            sum(col("t") * col("t")).as("stt"),
            sum(col("t") * col("t") * col("t")).as("sttt"),
            sum(col("t") * col("t") * col("t") * col("t")).as("stttt"),
            sum(col("z")).as("sz"), sum(col("t") * col("z")).as("szt"),
            sum(col("t") * col("t") * col("z")).as("szt2"),
            sum(col("z") * col("z")).as("szz"))
        aux.selectExpr("n", "CAST(2 AS BIGINT) AS df",
          """CASE WHEN (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)
            |    <= 0 THEN NULL
            |ELSE CAST(floor(n * (
            |  ((CAST(stttt AS DOUBLE) - CAST(stt AS DOUBLE) * stt / n)
            |    * (CAST(szt AS DOUBLE) - CAST(st AS DOUBLE) * sz / n)
            |    * (CAST(szt AS DOUBLE) - CAST(st AS DOUBLE) * sz / n)
            |   - 2 * (CAST(sttt AS DOUBLE) - CAST(st AS DOUBLE) * stt / n)
            |    * (CAST(szt AS DOUBLE) - CAST(st AS DOUBLE) * sz / n)
            |    * (CAST(szt2 AS DOUBLE) - CAST(stt AS DOUBLE) * sz / n)
            |   + (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)
            |    * (CAST(szt2 AS DOUBLE) - CAST(stt AS DOUBLE) * sz / n)
            |    * (CAST(szt2 AS DOUBLE) - CAST(stt AS DOUBLE) * sz / n))
            |  / (((CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)
            |     * (CAST(stttt AS DOUBLE) - CAST(stt AS DOUBLE) * stt / n)
            |    - (CAST(sttt AS DOUBLE) - CAST(st AS DOUBLE) * stt / n)
            |     * (CAST(sttt AS DOUBLE) - CAST(st AS DOUBLE) * stt / n))
            |    * (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n)))
            |  * 1000000) AS BIGINT) END AS lm_e6""".stripMargin)
      },
      Some(monthAxisSql + ",\n" + momentsSql +
        s""",
           |zr AS (SELECT n, t, ($zExpr) AS z FROM ax CROSS JOIN m),
           |aux AS (SELECT n, CAST(sum(t) AS BIGINT) AS st,
           |          CAST(sum(t * t) AS BIGINT) AS stt,
           |          CAST(sum(t * t * t) AS BIGINT) AS sttt,
           |          CAST(sum(t * t * t * t) AS BIGINT) AS stttt,
           |          CAST(sum(z) AS BIGINT) AS sz,
           |          CAST(sum(t * z) AS BIGINT) AS szt,
           |          CAST(sum(t * t * z) AS BIGINT) AS szt2,
           |          CAST(sum(z * z) AS BIGINT) AS szz
           |        FROM zr GROUP BY n)
           |SELECT n, CAST(2 AS BIGINT) AS df,
           |  CASE WHEN (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)
           |      <= 0 THEN NULL
           |  ELSE CAST(floor(n * (
           |    ((CAST(stttt AS DOUBLE) - CAST(stt AS DOUBLE) * stt / n)
           |      * (CAST(szt AS DOUBLE) - CAST(st AS DOUBLE) * sz / n)
           |      * (CAST(szt AS DOUBLE) - CAST(st AS DOUBLE) * sz / n)
           |     - 2 * (CAST(sttt AS DOUBLE) - CAST(st AS DOUBLE) * stt / n)
           |      * (CAST(szt AS DOUBLE) - CAST(st AS DOUBLE) * sz / n)
           |      * (CAST(szt2 AS DOUBLE) - CAST(stt AS DOUBLE) * sz / n)
           |     + (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)
           |      * (CAST(szt2 AS DOUBLE) - CAST(stt AS DOUBLE) * sz / n)
           |      * (CAST(szt2 AS DOUBLE) - CAST(stt AS DOUBLE) * sz / n))
           |    / (((CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)
           |       * (CAST(stttt AS DOUBLE) - CAST(stt AS DOUBLE) * stt
           |          / n)
           |      - (CAST(sttt AS DOUBLE) - CAST(st AS DOUBLE) * stt / n)
           |       * (CAST(sttt AS DOUBLE) - CAST(st AS DOUBLE) * stt / n))
           |      * (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n)))
           |    * 1000000) AS BIGINT) END AS lm_e6
           |FROM aux""".stripMargin)),

    // ── Hopkins clustering-tendency statistic on the embeddings.
    QueryDef("q_hopkins",
      (s, d) => {
        val comp = Tables.embeddings(s, d)
          .select(col("vec_id"), posexplode(col("embedding"))
            .as(Seq("p", "x")))
          .select(col("vec_id"), (col("p") + 1).as("i"),
            expr("CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)").as("v"))
          .localCheckpoint(false) // bounds + both distance scans
        val bounds = comp.groupBy(col("i"))
          .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        val ks = comp.sparkSession.range(0, 16).toDF("k")
        val synth = ks.crossJoin(broadcast(bounds))
          .selectExpr("k", "i",
            """mn + (mx - mn) * (((k + 1) * 73856093 + i * 19349663)
              |% 1000003) div 1000003 AS v""".stripMargin)
        val u = broadcast(synth).join(comp.select(col("i"),
            col("v").as("w"), col("vec_id")), Seq("i"))
          .groupBy(col("k"), col("vec_id"))
          .agg(sum((col("v") - col("w")) * (col("v") - col("w"))).as("d2"))
          .groupBy(col("k")).agg(min(col("d2")).as("ud"))
          .agg(sum(col("ud")).as("sum_u"), count(lit(1)).as("m_u"))
        val probes = comp.filter(col("vec_id") % 125 === 0)
          .select(col("vec_id").as("pk"), col("i"), col("v"))
        val w = broadcast(probes).join(comp.select(col("i"),
            col("v").as("w"), col("vec_id")), Seq("i"))
          .where(col("vec_id") =!= col("pk"))
          .groupBy(col("pk"), col("vec_id"))
          .agg(sum((col("v") - col("w")) * (col("v") - col("w"))).as("d2"))
          .groupBy(col("pk")).agg(min(col("d2")).as("wd"))
          .agg(sum(col("wd")).as("sum_w"), count(lit(1)).as("m_w"))
        u.crossJoin(broadcast(w))
          .selectExpr("m_u", "m_w", "sum_u", "sum_w",
            """CASE WHEN sum_u + sum_w = 0 THEN NULL
              |ELSE sum_u * 1000000 div (sum_u + sum_w)
              |END AS hopkins_e6""".stripMargin)
      },
      Some(s"""WITH $compSql,
              |bounds AS (SELECT i, CAST(min(v) AS BIGINT) AS mn,
              |             CAST(max(v) AS BIGINT) AS mx
              |           FROM comp GROUP BY 1),
              |synth AS (SELECT k, i,
              |            mn + (mx - mn) * (((k + 1) * 73856093
              |              + i * 19349663) % 1000003) // 1000003 AS v
              |          FROM (SELECT unnest(range(0, 16)) AS k)
              |          CROSS JOIN bounds),
              |ud AS (SELECT k, CAST(min(d2) AS BIGINT) AS ud
              |       FROM (SELECT s.k, c.vec_id,
              |               sum((s.v - c.v) * (s.v - c.v)) AS d2
              |             FROM synth s JOIN comp c USING (i)
              |             GROUP BY 1, 2)
              |       GROUP BY 1),
              |uu AS (SELECT CAST(sum(ud) AS BIGINT) AS sum_u,
              |         CAST(count(*) AS BIGINT) AS m_u FROM ud),
              |wd AS (SELECT pk, CAST(min(d2) AS BIGINT) AS wd
              |       FROM (SELECT p.vec_id AS pk, c.vec_id,
              |               sum((p.v - c.v) * (p.v - c.v)) AS d2
              |             FROM comp p JOIN comp c USING (i)
              |             WHERE p.vec_id % 125 = 0
              |               AND c.vec_id <> p.vec_id
              |             GROUP BY 1, 2)
              |       GROUP BY 1),
              |ww AS (SELECT CAST(sum(wd) AS BIGINT) AS sum_w,
              |         CAST(count(*) AS BIGINT) AS m_w FROM wd)
              |SELECT m_u, m_w, sum_u, sum_w,
              |       CASE WHEN sum_u + sum_w = 0 THEN NULL
              |       ELSE sum_u * 1000000 // (sum_u + sum_w)
              |       END AS hopkins_e6
              |FROM uu CROSS JOIN ww""".stripMargin)),

    // ── Expected + maximum calibration error, train-even score-odd.
    QueryDef("q_ece_split",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(
          expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("band"),
          (col("l_returnflag") === "R").as("r"),
          (col("l_orderkey") % 2 === 0).as("train"))
        val conf = li.filter(col("train"))
          .groupBy(col("band"))
          .agg(sum(when(col("r"), 1L).otherwise(0L)).as("pos"),
            count(lit(1)).as("cnt"))
          .selectExpr("band", "pos * 1000000 div cnt AS conf_e6")
        val ev = li.filter(!col("train"))
          .groupBy(col("band"))
          .agg(sum(when(col("r"), 1L).otherwise(0L)).as("pos"),
            count(lit(1)).as("n_b"))
          .selectExpr("band", "n_b", "pos * 1000000 div n_b AS acc_e6")
        ev.join(broadcast(conf), Seq("band"))
          .agg(sum(col("n_b")).as("n_eval"),
            sum(col("n_b") * abs(col("acc_e6") - col("conf_e6"))).as("gap"),
            max(abs(col("acc_e6") - col("conf_e6"))).as("mce_e6"))
          .selectExpr("n_eval", "gap div n_eval AS ece_e6", "mce_e6")
      },
      Some("""WITH li AS (
             |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
             |           AS band,
             |         l_returnflag = 'R' AS r,
             |         l_orderkey % 2 = 0 AS train
             |  FROM lineitem),
             |conf AS (SELECT band,
             |           CAST(sum(CASE WHEN r THEN 1 ELSE 0 END)
             |             * 1000000 // count(*) AS BIGINT) AS conf_e6
             |         FROM li WHERE train GROUP BY 1),
             |ev AS (SELECT band, CAST(count(*) AS BIGINT) AS n_b,
             |         CAST(sum(CASE WHEN r THEN 1 ELSE 0 END)
             |           * 1000000 // count(*) AS BIGINT) AS acc_e6
             |       FROM li WHERE NOT train GROUP BY 1)
             |SELECT CAST(sum(n_b) AS BIGINT) AS n_eval,
             |       CAST(sum(n_b * abs(acc_e6 - conf_e6)) AS BIGINT)
             |         // CAST(sum(n_b) AS BIGINT) AS ece_e6,
             |       CAST(max(abs(acc_e6 - conf_e6)) AS BIGINT) AS mce_e6
             |FROM ev JOIN conf USING (band)""".stripMargin))
  )
}
