package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Curation, Experiment, Privacy, Sketches, Stats, TextAnalysis, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-13 extension batch: the relational melt (unpivot) gap, the
  * diff-in-differences quasi-experimental estimator, t-closeness (the
  * third privacy audit after k-anonymity and l-diversity), and a
  * register-based HyperLogLog whose harmonic mean is computed exactly
  * in integers. Every oracle is plain DuckDB SQL over the shared
  * parquet. */
object Round13Queries {

  import PortableSql.{hash48 => hash48Sql}

  private def centsCol(c: String) = floor(col(c) * 100 + 0.5).cast("long")
  private def cents(c: String) = s"CAST(floor($c * 100 + 0.5) AS BIGINT)"

  /** Per-type daily series (event_type, t = day index, v = exact e4
    * daily mean) — the shared spine for the series-shape operators. */
  private def daily(s: org.apache.spark.sql.SparkSession, d: String) =
    TimeSeries.resample(Tables.events(s, d), "event_type", "ts", "value", 86400L)
      .select(col("event_type"), expr("bucket_es div 86400").as("t"),
        col("avg_e4").as("v"))

  /** DuckDB twin of [[daily]] (CTE `s`). */
  private val dailySql =
    """WITH r AS (SELECT event_type,
      |                  (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS bucket_es,
      |                  count(*) AS cnt,
      |                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) * 100
      |                       // count(*) AS BIGINT) AS avg_e4
      |           FROM events GROUP BY 1, 2),
      |s AS (SELECT event_type, bucket_es // 86400 AS t, avg_e4 AS v FROM r)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── Unpivot / melt — wide metric columns to (metric, value) rows,
    //    the inverse of q_pivot. Spark's native `unpivot` keeps the
    //    melt inside whole-stage codegen (one Expand node, no shuffle
    //    until the final aggregate).
    QueryDef("q_unpivot",
      (s, d) => {
        val src = Tables.lineitem(s, d).select(
          centsCol("l_quantity").as("qty_cents"),
          centsCol("l_extendedprice").as("price_cents"),
          centsCol("l_discount").as("disc_cents"),
          centsCol("l_tax").as("tax_cents"))
        src.unpivot(Array.empty, src.columns.map(col), "metric", "v_cents")
          .groupBy(col("metric"))
          .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("sum_cents"))
          .withColumn("mean_e4", expr("sum_cents * 10000L div n"))
      },
      Some(s"""WITH src AS (SELECT ${cents("l_quantity")} AS qty_cents,
              |                    ${cents("l_extendedprice")} AS price_cents,
              |                    ${cents("l_discount")} AS disc_cents,
              |                    ${cents("l_tax")} AS tax_cents FROM lineitem),
              |u AS (UNPIVOT src ON qty_cents, price_cents, disc_cents, tax_cents
              |      INTO NAME metric VALUE v_cents)
              |SELECT metric, CAST(count(*) AS BIGINT) AS n,
              |       CAST(sum(v_cents) AS BIGINT) AS sum_cents,
              |       CAST(sum(v_cents) * 10000 // count(*) AS BIGINT) AS mean_e4
              |FROM u GROUP BY 1""".stripMargin)),

    // ── Difference-in-differences over the events stream: treatment =
    //    odd user ids, post-period = second half of the observed clock
    //    (cutoff derived from the data, so it is SF-stable). All-integer
    //    e4 means make the estimate replay exactly.
    QueryDef("q_diff_in_diff",
      (s, d) => {
        val raw = Tables.events(s, d).select(
          (col("user_id") % 2).cast("int").as("treat"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
          centsCol("value").as("cents"))
        val bounds = raw.agg(
          expr("(min(us) + max(us)) div 2").as("cutoff"))
        val cells = raw.crossJoin(broadcast(bounds))
          .withColumn("post", when(col("us") >= col("cutoff"), 1).otherwise(0))
        Experiment.diffInDiff(cells, "treat", "post", "cents")
      },
      Some(s"""WITH raw AS (SELECT user_id % 2 AS treat,
              |                    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
              |                    ${cents("value")} AS cents FROM events),
              |b AS (SELECT (min(us) + max(us)) // 2 AS cutoff FROM raw),
              |p AS (SELECT treat, CASE WHEN us >= cutoff THEN 1 ELSE 0 END AS post,
              |             cents FROM raw CROSS JOIN b),
              |agg AS (SELECT
              |  CAST(count(*) FILTER (WHERE treat = 0 AND post = 0) AS BIGINT) AS n_c_pre,
              |  CAST(count(*) FILTER (WHERE treat = 0 AND post = 1) AS BIGINT) AS n_c_post,
              |  CAST(count(*) FILTER (WHERE treat = 1 AND post = 0) AS BIGINT) AS n_t_pre,
              |  CAST(count(*) FILTER (WHERE treat = 1 AND post = 1) AS BIGINT) AS n_t_post,
              |  CAST(coalesce(sum(cents) FILTER (WHERE treat = 0 AND post = 0), 0) AS BIGINT) AS s_c_pre,
              |  CAST(coalesce(sum(cents) FILTER (WHERE treat = 0 AND post = 1), 0) AS BIGINT) AS s_c_post,
              |  CAST(coalesce(sum(cents) FILTER (WHERE treat = 1 AND post = 0), 0) AS BIGINT) AS s_t_pre,
              |  CAST(coalesce(sum(cents) FILTER (WHERE treat = 1 AND post = 1), 0) AS BIGINT) AS s_t_post
              |  FROM p),
              |m AS (SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
              |             CAST(s_c_pre * 10000 // n_c_pre AS BIGINT) AS mean_c_pre_e4,
              |             CAST(s_c_post * 10000 // n_c_post AS BIGINT) AS mean_c_post_e4,
              |             CAST(s_t_pre * 10000 // n_t_pre AS BIGINT) AS mean_t_pre_e4,
              |             CAST(s_t_post * 10000 // n_t_post AS BIGINT) AS mean_t_post_e4
              |      FROM agg)
              |SELECT *, (mean_t_post_e4 - mean_t_pre_e4)
              |        - (mean_c_post_e4 - mean_c_pre_e4) AS did_e4 FROM m""".stripMargin)),

    // ── t-closeness audit (completes the k-anonymity / l-diversity
    //    trio): EMD between each quasi-identifier group's sensitive
    //    distribution (acctbal thousands-buckets) and the global one,
    //    as a cumulative window over the zero-filled bucket grid.
    QueryDef("q_t_closeness",
      (s, d) => Privacy.tCloseness(
        Tables.customer(s, d).select(
          col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bucket")),
        Seq("nation", "segment"), "bucket"),
      Some("""WITH cnt AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
             |                    c_mktsegment AS segment,
             |                    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bucket,
             |                    CAST(count(*) AS BIGINT) AS n
             |             FROM customer GROUP BY 1, 2, 3),
             |gb AS (SELECT DISTINCT bucket FROM cnt),
             |gl AS (SELECT bucket,
             |              CAST(sum(n) * 1000000 // (SELECT sum(n) FROM cnt) AS BIGINT) AS q_e6
             |       FROM cnt GROUP BY 1),
             |gr AS (SELECT nation, segment, CAST(sum(n) AS BIGINT) AS ntot
             |       FROM cnt GROUP BY 1, 2),
             |grid AS (SELECT nation, segment, ntot, bucket FROM gr CROSS JOIN gb),
             |sh AS (SELECT g.nation, g.segment, g.bucket, g.ntot,
             |              coalesce(c.n, 0) * 1000000 // g.ntot - q.q_e6 AS d_e6
             |       FROM grid g
             |       LEFT JOIN cnt c ON g.nation = c.nation
             |            AND g.segment = c.segment AND g.bucket = c.bucket
             |       JOIN gl q ON g.bucket = q.bucket),
             |cm AS (SELECT nation, segment, ntot,
             |              sum(d_e6) OVER (PARTITION BY nation, segment
             |                              ORDER BY bucket) AS cum
             |       FROM sh)
             |SELECT nation, segment, CAST(max(ntot) AS BIGINT) AS n,
             |       CAST(count(*) AS BIGINT) AS m_buckets,
             |       CAST(sum(abs(cum)) // (count(*) - 1) AS BIGINT) AS t_e6
             |FROM cm GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin)),

    // ── Register-based HyperLogLog over lineitem order keys: 64
    //    registers of max first-set-bit rank; the harmonic mean is
    //    factored as α·m²·2^ρmax / Σ 2^(ρmax−ρ) so the whole estimate
    //    is integer (oracle replays bit-for-bit). countDistinct would
    //    shuffle every distinct key; this shuffles 64 rows.
    QueryDef("q_hll",
      (s, d) => Sketches.hll(
        Tables.lineitem(s, d).select(col("l_orderkey")), "l_orderkey"),
      Some {
        val h = hash48Sql("CAST(l_orderkey AS VARCHAR)", "'hll'")
        val rho = Sketches.hllRhoSql(s"(h >> 6) & ${(1L << 26) - 1}")
        s"""WITH hx AS (SELECT $h AS h FROM lineitem),
           |r0 AS (SELECT h % 64 AS bucket, $rho AS rho FROM hx),
           |regs AS (SELECT bucket, max(rho) AS r FROM r0 GROUP BY 1),
           |grid AS (SELECT range AS bucket FROM range(64)),
           |filled AS (SELECT CAST(coalesce(r, 0) AS BIGINT) AS r
           |           FROM grid LEFT JOIN regs USING (bucket)),
           |m AS (SELECT CAST(max(r) AS BIGINT) AS rmax FROM filled),
           |sm AS (SELECT rmax,
           |              CAST(count(*) FILTER (WHERE r > 0) AS BIGINT) AS nz_registers,
           |              CAST(sum(CAST(1 AS BIGINT) << CAST(rmax - r AS INT)) AS BIGINT) AS s
           |       FROM filled CROSS JOIN m GROUP BY rmax)
           |SELECT rmax, nz_registers, s,
           |       CAST(709 * 64 * 64 * (CAST(1 AS BIGINT) << CAST(rmax AS INT)) // (s * 1000) AS BIGINT) AS est
           |FROM sm""".stripMargin
      }),

    // ── Theta/KMV sketch set operations over two corpus snapshots
    //    ("yesterday" = doc_id%10 < 8, "today" = doc_id%10 > 1): union /
    //    intersection / difference cardinalities from two k=16 sketches
    //    — never joining the raw sets. All-integer c·2⁴⁸ div θ.
    QueryDef("q_theta_sketch",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Sketches.thetaSetOps(
          docs.filter(col("doc_id") % 10 < 8).select(col("doc_id")),
          docs.filter(col("doc_id") % 10 > 1).select(col("doc_id")), 16)
      },
      Some {
        val h = hash48Sql("CAST(doc_id AS VARCHAR)", "'theta'")
        s"""WITH ka AS (SELECT DISTINCT $h AS h FROM documents
           |            WHERE doc_id % 10 < 8 ORDER BY h LIMIT 16),
           |kb AS (SELECT DISTINCT $h AS h FROM documents
           |       WHERE doc_id % 10 > 1 ORDER BY h LIMIT 16),
           |u AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
           |      ORDER BY h LIMIT 16),
           |th AS (SELECT max(h) AS theta FROM u),
           |j AS (SELECT coalesce(a.h, b.h) AS h,
           |             a.h IS NOT NULL AS ia, b.h IS NOT NULL AS ib
           |      FROM ka a FULL JOIN kb b ON a.h = b.h),
           |f AS (SELECT * FROM j CROSS JOIN th WHERE h < theta)
           |SELECT CAST(16 AS BIGINT) AS k, CAST(max(theta) AS BIGINT) AS theta,
           |       CAST(count(*) FILTER (WHERE ia) * 281474976710656 // max(theta) AS BIGINT) AS est_a,
           |       CAST(count(*) FILTER (WHERE ib) * 281474976710656 // max(theta) AS BIGINT) AS est_b,
           |       CAST(count(*) * 281474976710656 // max(theta) AS BIGINT) AS est_union,
           |       CAST(count(*) FILTER (WHERE ia AND ib) * 281474976710656 // max(theta) AS BIGINT) AS est_inter,
           |       CAST(count(*) FILTER (WHERE ia AND NOT ib) * 281474976710656 // max(theta) AS BIGINT) AS est_diff_ab
           |FROM f""".stripMargin
      }),

    // ── Hashing-trick featurization load report: project the corpus
    //    vocabulary onto 256 dims, emit the 20 heaviest dims with their
    //    token mass and collision counts.
    QueryDef("q_feature_hashing",
      (s, d) => TextAnalysis.featureHashing(Tables.documents(s, d)),
      Some {
        val h = hash48Sql("token", "'fh'")
        """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
          |t2 AS (SELECT token FROM toks WHERE token <> ''),
          |d AS (SELECT HEXPR % 256 AS dim, token FROM t2),
          |c AS (SELECT dim, token, count(*) AS c FROM d GROUP BY 1, 2),
          |g AS (SELECT dim, CAST(sum(c) AS BIGINT) AS n_tokens,
          |             CAST(count(*) AS BIGINT) AS n_distinct FROM c GROUP BY 1)
          |SELECT dim, n_tokens, n_distinct FROM g
          |ORDER BY n_tokens DESC, dim LIMIT 20""".stripMargin
          .replace("HEXPR", h)
      }),

    // ── Smoothed leave-one-out target encoding of order priority
    //    against order value: the no-leakage categorical featurizer,
    //    graded by each category's encoding envelope (min/max/avg).
    QueryDef("q_target_encoding",
      (s, d) => Curation.targetEncoding(
        Tables.orders(s, d).select(col("o_orderpriority").as("cat"),
          centsCol("o_totalprice").as("y")), "cat", "y"),
      Some(s"""WITH src AS (SELECT o_orderpriority AS cat,
              |                    ${cents("o_totalprice")} AS y FROM orders),
              |g AS (SELECT sum(y) // count(*) AS mu FROM src),
              |w AS (SELECT cat, y, sum(y) OVER (PARTITION BY cat) AS s_c,
              |             count(*) OVER (PARTITION BY cat) AS n_c FROM src),
              |e AS (SELECT cat, (s_c - y + 10 * mu) // (n_c - 1 + 10) AS enc
              |      FROM w CROSS JOIN g)
              |SELECT cat, CAST(count(*) AS BIGINT) AS n,
              |       CAST(min(enc) AS BIGINT) AS enc_min,
              |       CAST(max(enc) AS BIGINT) AS enc_max,
              |       CAST(sum(enc) // count(*) AS BIGINT) AS enc_avg
              |FROM e GROUP BY 1""".stripMargin)),

    // ── Pairwise Pearson correlation matrix over the four lineitem
    //    money columns: one exact-moment aggregate (DECIMAL(38,0)),
    //    six pairs stacked out, doubles touched once per pair.
    QueryDef("q_corr_matrix",
      (s, d) => Stats.corrMatrix(Tables.lineitem(s, d).select(
        centsCol("l_quantity").as("qty"),
        centsCol("l_extendedprice").as("price"),
        centsCol("l_discount").as("disc"),
        centsCol("l_tax").as("tax")), Seq("qty", "price", "disc", "tax")),
      Some {
        val cs = Seq("qty" -> "l_quantity", "price" -> "l_extendedprice",
          "disc" -> "l_discount", "tax" -> "l_tax")
        val pairs = for (i <- cs.indices; j <- i + 1 until cs.size)
          yield (cs(i)._1, cs(j)._1)
        val moments =
          cs.map { case (a, s0) => s"sum(CAST(${cents(s0)} AS HUGEINT)) AS s_$a" } ++
          cs.map { case (a, s0) =>
            s"sum(CAST(${cents(s0)} AS HUGEINT) * CAST(${cents(s0)} AS HUGEINT)) AS q_$a" } ++
          pairs.map { case (a, b) =>
            val sa = cs.toMap.apply(a); val sb = cs.toMap.apply(b)
            s"sum(CAST(${cents(sa)} AS HUGEINT) * CAST(${cents(sb)} AS HUGEINT)) AS x_${a}_$b" }
        val rows = pairs.map { case (a, b) =>
          s"""SELECT '$a~$b' AS pair, CAST(n AS BIGINT) AS n,
             |  CASE WHEN n * q_$a - s_$a * s_$a = 0 OR n * q_$b - s_$b * s_$b = 0 THEN NULL
             |       ELSE round(CAST(n * x_${a}_$b - s_$a * s_$b AS DOUBLE) /
             |            sqrt(CAST(n * q_$a - s_$a * s_$a AS DOUBLE) *
             |                 CAST(n * q_$b - s_$b * s_$b AS DOUBLE)), 6)
             |  END AS corr FROM m""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |  ${moments.mkString(",\n  ")}
           |  FROM lineitem)
           |$rows""".stripMargin
      }),

    // ── SAX symbolization of each type's daily series: PAA over 4-day
    //    frames, quartile-coded against the series' own breakpoints
    //    (integer-exact, no z-normalization), concatenated in time
    //    order into a shape fingerprint string.
    QueryDef("q_sax",
      (s, d) => TimeSeries.saxSymbols(daily(s, d), "event_type"),
      Some(s"""$dailySql,
              |f AS (SELECT event_type, t // 4 AS frame,
              |             CAST(sum(v) // count(*) AS BIGINT) AS paa
              |      FROM s GROUP BY 1, 2),
              |q AS (SELECT event_type, frame,
              |             ntile(4) OVER (PARTITION BY event_type
              |                            ORDER BY paa, frame) AS q FROM f),
              |sym AS (SELECT event_type, frame,
              |               CASE q WHEN 1 THEN 'a' WHEN 2 THEN 'b'
              |                      WHEN 3 THEN 'c' ELSE 'd' END AS sym FROM q)
              |SELECT event_type, CAST(count(*) AS BIGINT) AS n_frames,
              |       string_agg(sym, '' ORDER BY frame) AS sax
              |FROM sym GROUP BY 1""".stripMargin)),

    // ── MATCH_RECOGNIZE-style row patterns over the daily series:
    //    strict V-shapes (prev > v < next) with maximal depth, and the
    //    longest strictly-decreasing run (gaps-and-islands in the
    //    oracle; a struct-accumulator fold on the engine side).
    QueryDef("q_pattern_vshape",
      (s, d) => TimeSeries.vShapeRuns(daily(s, d), "event_type"),
      Some(s"""$dailySql,
              |w AS (SELECT event_type, t, v,
              |             lag(v) OVER w1 AS pv, lead(v) OVER w1 AS nv
              |      FROM s WINDOW w1 AS (PARTITION BY event_type ORDER BY t)),
              |dd AS (SELECT *,
              |              (pv IS NOT NULL AND nv IS NOT NULL
              |               AND pv > v AND nv > v) AS vmin,
              |              (pv IS NOT NULL AND v < pv) AS down FROM w),
              |isl AS (SELECT event_type, t, down,
              |               sum(CASE WHEN down THEN 0 ELSE 1 END)
              |                 OVER (PARTITION BY event_type ORDER BY t) AS grp
              |        FROM dd),
              |runs AS (SELECT event_type, grp,
              |                count(*) FILTER (WHERE down) AS len
              |         FROM isl GROUP BY 1, 2),
              |base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_points,
              |                CAST(count(*) FILTER (WHERE vmin) AS BIGINT) AS n_vshapes,
              |                CAST(max(CASE WHEN vmin THEN least(pv, nv) - v END) AS BIGINT) AS max_v_depth
              |         FROM dd GROUP BY 1),
              |lr AS (SELECT event_type, CAST(max(len) AS BIGINT) AS longest_down_run
              |       FROM runs GROUP BY 1)
              |SELECT base.*, lr.longest_down_run
              |FROM base JOIN lr USING (event_type)""".stripMargin)),

    // ── Theil–Sen robust slope of each type's daily series: lower
    //    median of all pairwise slopes, sign factored out so the
    //    truncating division is identical in both engines.
    QueryDef("q_theil_sen",
      (s, d) => TimeSeries.theilSen(daily(s, d), "event_type"),
      Some(s"""$dailySql,
              |p AS (SELECT a.event_type,
              |             a.t AS ti, b.t AS tj,
              |             CASE WHEN b.v >= a.v
              |                  THEN (b.v - a.v) * 1000000 // (b.t - a.t)
              |                  ELSE -((a.v - b.v) * 1000000 // (b.t - a.t))
              |             END AS slope_e6
              |      FROM s a JOIN s b
              |        ON a.event_type = b.event_type AND a.t < b.t),
              |rk AS (SELECT *,
              |             row_number() OVER (PARTITION BY event_type
              |                                ORDER BY slope_e6, ti, tj) AS rn,
              |             count(*) OVER (PARTITION BY event_type) AS np FROM p),
              |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
              |      FROM s GROUP BY 1)
              |SELECT event_type, n_points, CAST(np AS BIGINT) AS n_pairs,
              |       CAST(slope_e6 AS BIGINT) AS slope_e6
              |FROM rk JOIN n USING (event_type) WHERE rn = (np + 1) // 2""".stripMargin)),

    // ── Seasonal-naive vs one-step-naive forecastability (MASE-style):
    //    per type, the ratio of seasonal (t−7) to naive (t−1) absolute
    //    error mass over the shared eligible rows.
    QueryDef("q_mase",
      (s, d) => TimeSeries.maseRatio(daily(s, d), "event_type"),
      Some(s"""$dailySql,
              |w AS (SELECT event_type, v,
              |             lag(v, 1) OVER w1 AS l1, lag(v, 7) OVER w1 AS ls
              |      FROM s WINDOW w1 AS (PARTITION BY event_type ORDER BY t))
              |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              |       CAST(sum(abs(v - l1)) AS BIGINT) AS sae_naive,
              |       CAST(sum(abs(v - ls)) AS BIGINT) AS sae_seasonal,
              |       CAST(CASE WHEN sum(abs(v - l1)) = 0 THEN NULL
              |            ELSE sum(abs(v - ls)) * 1000000 // sum(abs(v - l1))
              |            END AS BIGINT) AS mase_e6
              |FROM w WHERE l1 IS NOT NULL AND ls IS NOT NULL
              |GROUP BY 1""".stripMargin))
  )
}
