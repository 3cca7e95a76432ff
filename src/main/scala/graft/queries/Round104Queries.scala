package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.functions._

/** Round-104 batch: corpus-slice divergence (Jensen–Shannon, source vs
  * rest) and Neyman optimal sampling allocation — estimators a curation
  * pipeline uses to decide WHERE to spend its next tokens.
  * (A Lincoln–Petersen capture–recapture variant was folded into the
  * pre-existing `q_capture_recapture` in Round84Queries.)
  */
object Round104Queries {

  /** Sign-factored truncating division (SURVEY.md:152 convention):
    * Spark `div` truncates, DuckDB `//` floors — they agree only on
    * non-negative numerators, so negative ones factor the sign out. */
  private def sdiv(x: String, y: String) =
    s"CASE WHEN ($x) >= 0 THEN ($x) div ($y) ELSE -((-($x)) div ($y)) END"
  private def sdivSql(x: String, y: String) =
    s"CASE WHEN ($x) >= 0 THEN ($x) // ($y) ELSE -((-($x)) // ($y)) END"

  def defs: Seq[QueryDef] = Seq(

    // ── Jensen–Shannon divergence of each source's word distribution
    //    vs the REST of the corpus — "which source is most atypical".
    //    JS = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2; every log argument is
    //    a positive integer rational (log₂(a/b) = log2E6(a)−log2E6(b)
    //    on the shared fixed-point table), so both engines quantize
    //    identically. The grid is sources × vocab (tiny) built from
    //    broadcast margins; the corpus is scanned once.
    QueryDef("q_js_source",
      (s, d) => {
        val sc = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy(col("source"), col("word")).agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // margins + the grid reuse it
        val wt = sc.groupBy(col("word")).agg(sum(col("c")).as("ct"))
        val st = sc.groupBy(col("source")).agg(sum(col("c")).as("ns"))
        val nt = st.agg(sum(col("ns")).as("n_tot"))
        val grid = st.crossJoin(broadcast(wt)).crossJoin(broadcast(nt))
          .join(sc, Seq("source", "word"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
          .withColumn("nr", expr("n_tot - ns"))
          .withColumn("cr", expr("ct - c"))
          .withColumn("b", expr("c * nr + cr * ns"))
          .withColumn("lb", Bm25.log2E6(col("b")))
          // CASE keeps log2E6 off zero arguments (lazy branches)
          .withColumn("tp", when(col("c") > 0,
            col("c") * (Bm25.log2E6(expr("2 * c * nr")) - col("lb")))
            .otherwise(lit(0L)))
          .withColumn("tq", when(col("cr") > 0,
            col("cr") * (Bm25.log2E6(expr("2 * cr * ns")) - col("lb")))
            .otherwise(lit(0L)))
        grid.groupBy(col("source"), col("ns"), col("nr"))
          .agg(sum(col("tp")).as("sp"), sum(col("tq")).as("sq"))
          .selectExpr("source", "ns AS n_words",
            sdiv(s"${sdiv("sp", "ns")} + ${sdiv("sq", "nr")}", "2") +
              " AS js_e6")
      },
      Some {
        val la = Bm25.log2E6Sql("2 * c * nr")
        val lb = Bm25.log2E6Sql("b")
        val lc = Bm25.log2E6Sql("2 * cr * ns")
        s"""WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
           |           FROM documents),
           |sc AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c
           |       FROM w WHERE word <> '' GROUP BY 1, 2),
           |wt AS (SELECT word, CAST(sum(c) AS BIGINT) AS ct FROM sc GROUP BY 1),
           |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM sc GROUP BY 1),
           |nt AS (SELECT CAST(sum(ns) AS BIGINT) AS n_tot FROM st),
           |grid AS (SELECT st.source, st.ns, wt.word, wt.ct,
           |                coalesce(sc.c, 0) AS c,
           |                n_tot - st.ns AS nr,
           |                wt.ct - coalesce(sc.c, 0) AS cr
           |         FROM st CROSS JOIN wt CROSS JOIN nt
           |         LEFT JOIN sc ON sc.source = st.source AND sc.word = wt.word),
           |t AS (SELECT source, ns, nr, c, cr, c * nr + cr * ns AS b
           |      FROM grid),
           |terms AS (SELECT source, ns, nr,
           |                 CASE WHEN c > 0
           |                   THEN c * ($la - $lb) ELSE 0 END AS tp,
           |                 CASE WHEN cr > 0
           |                   THEN cr * ($lc - $lb) ELSE 0 END AS tq
           |          FROM t),
           |agg AS (SELECT source, ns, nr, CAST(sum(tp) AS BIGINT) AS sp,
           |               CAST(sum(tq) AS BIGINT) AS sq
           |        FROM terms GROUP BY 1, 2, 3)
           |SELECT source, ns AS n_words,
           |       ${sdivSql(s"${sdivSql("sp", "ns")} + ${sdivSql("sq", "nr")}",
                     "2")} AS js_e6
           |FROM agg""".stripMargin
      }),

    // ── Neyman optimal allocation: how to split a 1000-unit sample
    //    across nation strata ∝ N_h·S_h. Order totals centered at the
    //    domain midpoint keep the integer moment sums exact; the
    //    variance combination runs in IEEE doubles per the trendSlope
    //    convention (exact-long inputs < 2^53, deterministic
    //    cross-engine). Proportional-allocation column beside it shows
    //    what the naive split would do.
    QueryDef("q_neyman",
      (s, d) => {
        val cells = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"),
            expr("CAST(floor(o_totalprice + 0.5) AS BIGINT) - 250000")
              .as("x"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_h"), sum(col("x")).as("sx"),
            sum(expr("x * x")).as("sxx"))
          .withColumn("s_dollars", expr(
            """CAST(floor(sqrt((CAST(n_h AS DOUBLE) * CAST(sxx AS DOUBLE)
              |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |  / CAST(n_h AS DOUBLE) / CAST(n_h - 1 AS DOUBLE)))
              |  AS BIGINT)""".stripMargin))
          .localCheckpoint(false) // stratum frame + the ΣN·S total
        val tot = cells.agg(sum(expr("n_h * s_dollars")).as("w_tot"),
          sum(col("n_h")).as("n_tot"))
        cells.crossJoin(broadcast(tot))
          .selectExpr("n_name", "n_h", "s_dollars",
            "n_h * s_dollars * 1000 div greatest(w_tot, 1) AS neyman_alloc",
            "n_h * 1000 div n_tot AS prop_alloc")
      },
      Some("""WITH cells AS (SELECT n_name,
             |                      CAST(count(*) AS BIGINT) AS n_h,
             |                      CAST(sum(CAST(floor(o_totalprice + 0.5)
             |                        AS BIGINT) - 250000) AS BIGINT) AS sx,
             |                      CAST(sum((CAST(floor(o_totalprice + 0.5)
             |                        AS BIGINT) - 250000)
             |                        * (CAST(floor(o_totalprice + 0.5)
             |                        AS BIGINT) - 250000)) AS BIGINT) AS sxx
             |               FROM orders
             |               JOIN customer ON o_custkey = c_custkey
             |               JOIN nation ON c_nationkey = n_nationkey
             |               GROUP BY 1),
             |sd AS (SELECT n_name, n_h,
             |              CAST(floor(sqrt((CAST(n_h AS DOUBLE)
             |                * CAST(sxx AS DOUBLE)
             |                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |                / CAST(n_h AS DOUBLE)
             |                / CAST(n_h - 1 AS DOUBLE))) AS BIGINT)
             |                AS s_dollars
             |       FROM cells),
             |t AS (SELECT CAST(sum(n_h * s_dollars) AS BIGINT) AS w_tot,
             |             CAST(sum(n_h) AS BIGINT) AS n_tot FROM sd)
             |SELECT n_name, n_h, s_dollars,
             |       n_h * s_dollars * 1000 // greatest(w_tot, 1)
             |         AS neyman_alloc,
             |       n_h * 1000 // n_tot AS prop_alloc
             |FROM sd CROSS JOIN t""".stripMargin))
  )
}
