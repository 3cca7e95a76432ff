package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-136 batch: embedding-curation screens a vector store runs
  * before trusting compression or feature selection — uniform scalar
  * quantization error at 2/4/8 bits (the storage-budget curve: how
  * much cosine-relevant signal does b bits/dim keep), the per-dimension
  * variance profile (which dims carry the energy — the integer-moment
  * read PCA approximates), and label signature Hamming distances
  * (per-label majority-sign bitvectors — the cheapest class-separation
  * audit). Embeddings enter as e6-scaled integers (posexplode), so
  * every moment and quantizer is engine-exact; the dim and label axes
  * are bounded, so the heavy frame is only the (row × dim) explode —
  * one keyed rollup at any SF.
  */
object Round136Queries {

  /** (vec_id, label, i, v): embeddings flattened to e6-scaled-int
    * components — the shared entry point of all three queries. */
  private def comps(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))"))
          .as(Seq("i", "v")))

  private val compsSql =
    """e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
      |             generate_subscripts(
      |               CAST(embedding AS DOUBLE[]), 1) AS i,
      |             unnest(list_transform(
      |               CAST(embedding AS DOUBLE[]),
      |               x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))) AS v
      |      FROM embeddings)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── Quantization error: per dim the [min,max] range (one rollup),
    //    then for b ∈ {2,4,8}: code = (v−mn)·(2ᵇ−1) div range, recon =
    //    mn + code·range div (2ᵇ−1), MSE over all components in e12 per
    //    bit width (÷1e6 twice keeps it in-range). Range rows broadcast
    //    back onto the component stream — ONE wide pass per the 3-row
    //    bit axis.
    QueryDef("q_quantization_error",
      (s, d) => {
        val e = comps(s, d).localCheckpoint(false) // range build + error pass
        val rng = e.groupBy(col("i"))
          .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
          .filter(col("mx") > col("mn"))
        val bits = s.range(1, 4)
          .select(expr("CAST(shiftleft(1, CAST(id AS INT)) AS INT)").as("b"))
          .withColumn("levels", expr("CAST(shiftleft(1, b) - 1 AS BIGINT)"))
        e.join(broadcast(rng), "i")
          .crossJoin(broadcast(bits))
          .withColumn("code",
            expr("(v - mn) * levels div (mx - mn)"))
          .withColumn("err",
            expr("v - (mn + code * (mx - mn) div levels)"))
          .groupBy(col("b"))
          .agg(count(lit(1)).as("n_components"),
            sum(expr("err * err div 1000000")).as("sse_e6"))
          .selectExpr("CAST(b AS BIGINT) AS bits",
            "CAST(n_components AS BIGINT) AS n_components",
            "sse_e6 div n_components AS mse_e6")
      },
      Some(s"""WITH $compsSql,
             |rng AS (SELECT i, CAST(min(v) AS BIGINT) AS mn,
             |               CAST(max(v) AS BIGINT) AS mx
             |        FROM e GROUP BY 1 HAVING max(v) > min(v)),
             |bits AS (SELECT b, CAST((1 << b) - 1 AS BIGINT) AS levels
             |         FROM (SELECT unnest([2, 4, 8]) AS b)),
             |q AS (SELECT bits.b,
             |             e.v - (rng.mn + ((e.v - rng.mn) * bits.levels
             |               // (rng.mx - rng.mn)) * (rng.mx - rng.mn)
             |               // bits.levels) AS err
             |      FROM e JOIN rng ON e.i = rng.i CROSS JOIN bits)
             |SELECT CAST(b AS BIGINT) AS bits,
             |       CAST(count(*) AS BIGINT) AS n_components,
             |       CAST(sum(err * err // 1000000) AS BIGINT)
             |         // count(*) AS mse_e6
             |FROM q GROUP BY 1""".stripMargin)),

    // ── Dimension variance profile: exact integer moments per dim,
    //    population variance in e6 units² (÷1e6 on the squared-e6
    //    scale), ranked; cumulative energy share over the rank order
    //    (bounded dim axis → the window is safe). The feature-selection
    //    read: how many dims hold 90% of the variance.
    QueryDef("q_dim_variance_profile",
      (s, d) => {
        val m = comps(s, d).groupBy(col("i"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
            sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("svv"))
          .withColumn("var_e6", expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * svv - " +
              "CAST(sv AS DECIMAL(38,0)) * sv) div " +
              "(CAST(n AS DECIMAL(38,0)) * n * 1000000) AS BIGINT)"))
        val tot = m.agg(sum(col("var_e6")).as("tv"))
        m.crossJoin(broadcast(tot))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("var_e6").desc, col("i"))))
          .withColumn("cum", sum(col("var_e6")).over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("var_e6").desc, col("i"))
              .rowsBetween(org.apache.spark.sql.expressions.Window
                .unboundedPreceding, 0)))
          .filter(col("rk") <= 16)
          // +1: posexplode is 0-based, the oracle's generate_subscripts
          // is 1-based — emit the 1-based dim index both sides.
          .selectExpr("CAST(i + 1 AS BIGINT) AS dim", "var_e6",
            "cum * 1000000 div tv AS cum_share_e6",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some(s"""WITH $compsSql,
             |m AS (SELECT i, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(v) AS BIGINT) AS sv,
             |             sum(CAST(v AS HUGEINT) * v) AS svv
             |      FROM e GROUP BY 1),
             |vr AS (SELECT i,
             |              CAST((CAST(n AS HUGEINT) * svv
             |                - CAST(sv AS HUGEINT) * sv)
             |                // (CAST(n AS HUGEINT) * n * 1000000)
             |                AS BIGINT) AS var_e6
             |       FROM m),
             |tot AS (SELECT CAST(sum(var_e6) AS BIGINT) AS tv FROM vr),
             |rkd AS (SELECT i, var_e6,
             |               CAST(row_number() OVER (ORDER BY var_e6 DESC,
             |                 i) AS BIGINT) AS rk,
             |               CAST(sum(var_e6) OVER (ORDER BY var_e6 DESC,
             |                 i ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |                 AS cum
             |        FROM vr)
             |SELECT CAST(i AS BIGINT) AS dim, var_e6,
             |       cum * 1000000 // tv AS cum_share_e6, rk
             |FROM rkd CROSS JOIN tot WHERE rk <= 16""".stripMargin)),

    // ── Label signatures: per (label, dim) the majority sign vs the
    //    global per-dim mean (ties → 0, deterministic), then pairwise
    //    label Hamming distance over the bounded label×dim grid — are
    //    classes separable in sign space alone.
    QueryDef("q_label_signature_hamming",
      (s, d) => {
        val e = comps(s, d).localCheckpoint(false) // global means + label votes
        val gm = e.groupBy(col("i"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        val sig = e.join(broadcast(gm), "i")
          // v > mean ⟺ v·n > sv (integer cross-multiply, no division)
          .groupBy(col("label"), col("i"))
          .agg(sum(when(expr("v * n > sv"), 1L).otherwise(-1L)).as("vote"))
          .select(col("label"), col("i"),
            signum(col("vote")).cast("long").as("bit"))
          .localCheckpoint(false) // both sides of the pair grid
        sig.as("a").join(sig.as("b"),
            col("a.i") === col("b.i") && col("a.label") < col("b.label"))
          .groupBy(col("a.label").as("la"), col("b.label").as("lb"))
          .agg(count(lit(1)).as("n_dims"),
            sum(when(col("a.bit") =!= col("b.bit"), 1L).otherwise(0L))
              .as("hamming"))
          .selectExpr("la", "lb", "CAST(n_dims AS BIGINT) AS n_dims",
            "CAST(hamming AS BIGINT) AS hamming",
            "hamming * 1000000 div n_dims AS hamming_e6")
      },
      Some(s"""WITH $compsSql,
             |gm AS (SELECT i, CAST(count(*) AS BIGINT) AS n,
             |              CAST(sum(v) AS BIGINT) AS sv
             |       FROM e GROUP BY 1),
             |sig AS (SELECT e.label, e.i,
             |               CAST(CASE WHEN sum(CASE WHEN e.v * gm.n
             |                   > gm.sv THEN 1 ELSE -1 END) > 0 THEN 1
             |                 WHEN sum(CASE WHEN e.v * gm.n > gm.sv
             |                   THEN 1 ELSE -1 END) < 0 THEN -1
             |                 ELSE 0 END AS BIGINT) AS bit
             |        FROM e JOIN gm ON e.i = gm.i
             |        GROUP BY 1, 2)
             |SELECT a.label AS la, b.label AS lb,
             |       CAST(count(*) AS BIGINT) AS n_dims,
             |       CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0
             |         END) AS BIGINT) AS hamming,
             |       CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0
             |         END) AS BIGINT) * 1000000 // count(*) AS hamming_e6
             |FROM sig a JOIN sig b ON a.i = b.i AND a.label < b.label
             |GROUP BY 1, 2""".stripMargin))
  )
}
