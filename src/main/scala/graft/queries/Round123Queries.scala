package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-123 batch: deterministic-hash sampling audit (is the md5-
  * bucket 1/16 sample unbiased for revenue metrics — the check every
  * sampled dashboard needs before anyone trusts it), typo-pair mining
  * over the corpus vocabulary (edit-distance ≤ 2 between frequent
  * words — the vocab-normalization candidate list), and the Davies–
  * Bouldin cluster-validity index over the labeled embeddings (the
  * centroid-scatter complement to q_silhouette). Hash buckets and
  * edit distances are engine-exact; DB closes in rounded IEEE.
  */
object Round123Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Hash-sample audit: the 1/16 sample is orders whose
    //    md5(o_custkey) ends in '0' — the deterministic, join-stable
    //    sampling every engine can reproduce. Compares sampled vs full
    //    mean order value (exact cents) and emits the relative bias in
    //    sign-factored e6. One scan, two conditional aggregates.
    QueryDef("q_hash_sample_audit",
      (s, d) => {
        val v = Tables.orders(s, d)
          .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("cents"),
            (substring(md5(col("o_custkey").cast("string")), 32, 1)
              === "0").as("in_sample"))
        v.agg(count(lit(1)).as("n_full"), sum(col("cents")).as("s_full"),
          sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_samp"),
          sum(when(col("in_sample"), col("cents")).otherwise(0L))
            .as("s_samp"))
          .selectExpr("CAST(n_full AS BIGINT) AS n_full",
            "CAST(n_samp AS BIGINT) AS n_samp",
            "s_full div n_full AS mean_full_cents",
            "s_samp div n_samp AS mean_samp_cents",
            // relative bias of the sampled mean, e6, sign-factored. The
            // cross products ride decimal(38,0): s_full·n_samp ~ 3e16 at
            // sf0.1 and the ×1e6 numerator overflows int64 well before
            // 100× — widen BEFORE every multiply.
            """CASE WHEN CAST(s_samp AS DECIMAL(38,0)) * n_full
              |       >= CAST(s_full AS DECIMAL(38,0)) * n_samp
              |  THEN CAST((CAST(s_samp AS DECIMAL(38,0)) * n_full
              |         - CAST(s_full AS DECIMAL(38,0)) * n_samp) * 1000000
              |       div (CAST(s_full AS DECIMAL(38,0)) * n_samp)
              |       AS BIGINT)
              |ELSE -CAST((CAST(s_full AS DECIMAL(38,0)) * n_samp
              |         - CAST(s_samp AS DECIMAL(38,0)) * n_full) * 1000000
              |       div (CAST(s_full AS DECIMAL(38,0)) * n_samp)
              |       AS BIGINT)
              |END AS bias_e6""".stripMargin)
      },
      Some("""WITH v AS (
             |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |           AS cents,
             |         substring(md5(CAST(o_custkey AS VARCHAR)), 32, 1)
             |           = '0' AS in_sample
             |  FROM orders),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n_full,
             |             CAST(sum(cents) AS BIGINT) AS s_full,
             |             CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0
             |               END) AS BIGINT) AS n_samp,
             |             CAST(sum(CASE WHEN in_sample THEN cents
             |               ELSE 0 END) AS BIGINT) AS s_samp
             |      FROM v)
             |SELECT n_full, n_samp,
             |       s_full // n_full AS mean_full_cents,
             |       s_samp // n_samp AS mean_samp_cents,
             |       CAST(CASE WHEN CAST(s_samp AS HUGEINT) * n_full
             |                   >= CAST(s_full AS HUGEINT) * n_samp
             |              THEN (CAST(s_samp AS HUGEINT) * n_full
             |                    - CAST(s_full AS HUGEINT) * n_samp)
             |                   * 1000000
             |                   // (CAST(s_full AS HUGEINT) * n_samp)
             |            ELSE -((CAST(s_full AS HUGEINT) * n_samp
             |                    - CAST(s_samp AS HUGEINT) * n_full)
             |                   * 1000000
             |                   // (CAST(s_full AS HUGEINT) * n_samp))
             |       END AS BIGINT) AS bias_e6
             |FROM t""".stripMargin)),

    // ── Typo pairs: the 50 most frequent corpus words, pairwise
    //    Levenshtein ≤ 2 (excluding identical) — the candidate list a
    //    vocab-normalization pass reviews. The 50×49/2 grid is
    //    broadcast-sized; edit distance is integer-exact in both
    //    engines.
    QueryDef("q_typo_pairs",
      (s, d) => {
        val top = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("w")).agg(count(lit(1)).as("cw"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("cw").desc, col("w"))))
          .filter(col("rk") <= 50)
          .select(col("w"), col("cw"))
          .localCheckpoint(false) // both sides of the pair grid
        top.as("a").join(broadcast(top.as("b")),
            col("a.w") < col("b.w"))
          .withColumn("dist",
            levenshtein(col("a.w"), col("b.w")).cast("long"))
          .filter(col("dist") <= 2)
          .selectExpr("a.w AS w1", "b.w AS w2",
            "CAST(a.cw AS BIGINT) AS n1", "CAST(b.cw AS BIGINT) AS n2",
            "dist")
          .orderBy(col("dist"), col("w1"), col("w2"))
      },
      Some("""WITH wc AS (SELECT w, CAST(count(*) AS BIGINT) AS cw
             |           FROM (SELECT unnest(string_split(text, ' ')) AS w
             |                 FROM documents)
             |           WHERE w <> '' GROUP BY 1),
             |top AS (SELECT w, cw FROM (
             |          SELECT w, cw, row_number() OVER (ORDER BY cw DESC,
             |            w) AS rk
             |          FROM wc) WHERE rk <= 50)
             |SELECT a.w AS w1, b.w AS w2, a.cw AS n1, b.cw AS n2,
             |       CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
             |FROM top a JOIN top b ON a.w < b.w
             |WHERE levenshtein(a.w, b.w) <= 2""".stripMargin)),

    // ── Davies–Bouldin over the labeled embeddings: centroids stay
    //    exact rationals (sv/nv per dim); every per-member distance and
    //    centroid-pair distance is rounded to an e6 INTEGER before any
    //    cross-row aggregation, so no double ever sums in
    //    nondeterministic order. Squared sums ride decimal(38,0)/
    //    HUGEINT; DBᵢ = max_j (Sᵢ+Sⱼ)·1e6 div d(cᵢ,cⱼ) is pure integer
    //    arithmetic on the bounded label axis.
    QueryDef("q_davies_bouldin",
      (s, d) => {
        val dec = "decimal(38,0)"
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label"),
            posexplode(expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
              "x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))"))
              .as(Seq("i", "v")))
          .localCheckpoint(false) // centroid build + scatter join-back
        val cent = e.groupBy(col("label"), col("i"))
          .agg(sum(col("v")).as("sv"), count(lit(1)).as("nv"))
          .localCheckpoint(false) // member join + the label-pair grid
        val scat = e.join(cent, Seq("label", "i"))
          .groupBy(col("label"), col("vec_id"))
          .agg(sum(expr(s"CAST(nv * v - sv AS $dec)" +
            s" * CAST(nv * v - sv AS $dec)")).as("ssq"),
            max(col("nv")).as("nv"))
          .select(col("label"), expr(
            """CAST(round(sqrt(CAST(ssq AS DOUBLE)) / CAST(nv AS DOUBLE)
              |* CAST('1000000' AS DOUBLE), 0) AS BIGINT)"""
              .stripMargin).as("dist_e6"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("nl"), sum(col("dist_e6")).as("sd"))
          .select(col("label"), expr("sd div nl").as("s_e6"))
          .localCheckpoint(false) // joined twice into the pair frame
        val cpair = cent.as("a").join(cent.as("b"),
            col("a.i") === col("b.i") && col("a.label") < col("b.label"))
          .groupBy(col("a.label").as("la"), col("b.label").as("lb"))
          .agg(sum(expr(
            s"""CAST(a.sv * b.nv - b.sv * a.nv AS $dec)
               |* CAST(a.sv * b.nv - b.sv * a.nv AS $dec)"""
              .stripMargin)).as("dsq"),
            max(expr("a.nv * b.nv")).as("nn"))
          .select(col("la"), col("lb"), expr(
            """CAST(round(sqrt(CAST(dsq AS DOUBLE)) / CAST(nn AS DOUBLE)
              |* CAST('1000000' AS DOUBLE), 0) AS BIGINT)"""
              .stripMargin).as("dc_e6"))
        val both = cpair
          .unionByName(cpair.select(col("lb").as("la"),
            col("la").as("lb"), col("dc_e6")))
        val dbi = both
          .join(scat.select(col("label").as("la"), col("s_e6").as("sa")),
            "la")
          .join(scat.select(col("label").as("lb"), col("s_e6").as("sb")),
            "lb")
          .groupBy(col("la"))
          .agg(max(expr(
            "CASE WHEN dc_e6 = 0 THEN 0 " +
              "ELSE (sa + sb) * 1000000 div dc_e6 END")).as("db_e6"))
        dbi.agg(count(lit(1)).as("k"), sum(col("db_e6")).as("sdb"))
          .selectExpr("CAST(k AS BIGINT) AS n_labels",
            "sdb div k AS db_index_e6")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
             |                 generate_subscripts(
             |                   CAST(embedding AS DOUBLE[]), 1) AS i,
             |                 unnest(list_transform(
             |                   CAST(embedding AS DOUBLE[]),
             |                   x -> CAST(floor(x * 1000000 + 0.5)
             |                        AS BIGINT))) AS v
             |          FROM embeddings),
             |cent AS (SELECT label, i, CAST(sum(v) AS BIGINT) AS sv,
             |                CAST(count(*) AS BIGINT) AS nv
             |         FROM e GROUP BY 1, 2),
             |mem AS (SELECT e.label, e.vec_id,
             |               sum(CAST(nv * v - sv AS HUGEINT)
             |                   * CAST(nv * v - sv AS HUGEINT)) AS ssq,
             |               max(nv) AS nv
             |        FROM e JOIN cent ON e.label = cent.label
             |          AND e.i = cent.i
             |        GROUP BY 1, 2),
             |md AS (SELECT label,
             |              CAST(round(sqrt(CAST(ssq AS DOUBLE))
             |                / CAST(nv AS DOUBLE)
             |                * CAST('1000000' AS DOUBLE), 0) AS BIGINT)
             |                AS dist_e6
             |       FROM mem),
             |scat AS (SELECT label,
             |                CAST(sum(dist_e6) AS BIGINT) // count(*)
             |                  AS s_e6
             |         FROM md GROUP BY 1),
             |cp AS (SELECT a.label AS la, b.label AS lb,
             |              CAST(round(sqrt(CAST(sum(
             |                CAST(a.sv * b.nv - b.sv * a.nv AS HUGEINT)
             |                * CAST(a.sv * b.nv - b.sv * a.nv
             |                    AS HUGEINT)) AS DOUBLE))
             |                / CAST(max(a.nv * b.nv) AS DOUBLE)
             |                * CAST('1000000' AS DOUBLE), 0) AS BIGINT)
             |                AS dc_e6
             |       FROM cent a JOIN cent b ON a.i = b.i
             |         AND a.label < b.label
             |       GROUP BY 1, 2),
             |pr AS (SELECT la, lb, dc_e6 FROM cp
             |       UNION ALL SELECT lb, la, dc_e6 FROM cp),
             |dbi AS (SELECT la,
             |               max(CASE WHEN dc_e6 = 0 THEN 0
             |                        ELSE (sa.s_e6 + sb.s_e6) * 1000000
             |                             // dc_e6 END) AS db_e6
             |        FROM pr
             |        JOIN scat sa ON sa.label = pr.la
             |        JOIN scat sb ON sb.label = pr.lb
             |        GROUP BY 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_labels,
             |       CAST(sum(db_e6) AS BIGINT) // count(*)
             |         AS db_index_e6
             |FROM dbi""".stripMargin))
  )
}
