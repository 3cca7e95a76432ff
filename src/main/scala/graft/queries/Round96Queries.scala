package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-96 batch: true matrix-profile semantics over the daily-count
  * series — OVERLAPPING 7-day subsequences with a trivial-match
  * exclusion zone (|i−j| ≥ m), where q_ts_discord used disjoint
  * calendar weeks. Discord = subsequence with the FARTHEST nearest
  * neighbor; motif = the closest non-overlapping pair. Both ride one
  * shared window pipeline over the aggregated day axis.
  *
  * Scale: the day axis is calendar-bounded (years → thousands of rows
  * at ANY data volume), so the lead-window build and the pairwise join
  * are axis², never data². Subsequence positions are row_number over
  * PRESENT days (gaps close up), making the profile well-defined and
  * deterministic on sparse calendars too.
  */
object Round96Queries {

  private val m = 7 // subsequence length (days)

  private def windowsDf(s: org.apache.spark.sql.SparkSession, d: String) = {
    val daily = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("c"))
    val ord = Window.orderBy(col("day"))
    val leads = (1 until m).foldLeft(
      daily.withColumn("i", row_number().over(ord))
        .withColumn("v0", col("c"))) { (df, k) =>
      df.withColumn(s"v$k", lead(col("c"), k).over(ord))
    }
    leads.where(col(s"v${m - 1}").isNotNull)
      .select(Seq(col("day"), col("i")) ++
        (0 until m).map(k => col(s"v$k")): _*)
      .localCheckpoint(false) // both pair sides
  }

  private def windowsSql: String = {
    val leads = (1 until m).map(k =>
      s"lead(c, $k) OVER (ORDER BY day) AS v$k").mkString(", ")
    s"""daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
       |                CAST(count(*) AS BIGINT) AS c
       |          FROM events GROUP BY 1),
       |w0 AS (SELECT day, row_number() OVER (ORDER BY day) AS i,
       |              c AS v0, $leads
       |       FROM daily),
       |w AS (SELECT * FROM w0 WHERE v${m - 1} IS NOT NULL)""".stripMargin
  }

  private def d2Sql(a: String, b: String) = (0 until m).map(k =>
    s"($a.v$k - $b.v$k) * ($a.v$k - $b.v$k)").mkString(" + ")

  def defs: Seq[QueryDef] = Seq(

    // ── Discord: the subsequence whose NEAREST non-overlapping
    //    neighbor is farthest — the week-shaped anomaly overlapping
    //    windows can see and disjoint weeks can't (e.g. a shift
    //    straddling a week boundary).
    QueryDef("q_matrix_profile",
      (s, d) => {
        val w = windowsDf(s, d)
        val b = w.columns.foldLeft(w)((df, c) =>
          df.withColumnRenamed(c, c + "_b"))
        val d2 = (0 until m).map(k =>
          s"(v$k - v${k}_b) * (v$k - v${k}_b)").mkString(" + ")
        w.join(b, abs(col("i") - col("i_b")) >= m)
          .withColumn("d2", expr(d2))
          .groupBy(col("day"), col("i"))
          .agg(min(col("d2")).as("nn_d2"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("nn_d2").desc, col("day"))))
          .where(col("rk") <= 3)
          .select(col("day").as("start_day"), col("nn_d2"), col("rk"))
      },
      Some(s"""WITH $windowsSql,
              |prof AS (SELECT a.day, min(${d2Sql("a", "b")}) AS nn_d2
              |         FROM w a JOIN w b ON abs(a.i - b.i) >= $m
              |         GROUP BY 1)
              |SELECT day AS start_day, CAST(nn_d2 AS BIGINT) AS nn_d2, rk
              |FROM (SELECT *, CAST(row_number() OVER (ORDER BY nn_d2 DESC,
              |        day) AS BIGINT) AS rk FROM prof)
              |WHERE rk <= 3""".stripMargin)),

    // ── Motif: the CLOSEST non-overlapping subsequence pair — the
    //    repeated weekly pattern; same pipeline, opposite extreme.
    QueryDef("q_mp_motif",
      (s, d) => {
        val w = windowsDf(s, d)
        val b = w.columns.foldLeft(w)((df, c) =>
          df.withColumnRenamed(c, c + "_b"))
        val d2 = (0 until m).map(k =>
          s"(v$k - v${k}_b) * (v$k - v${k}_b)").mkString(" + ")
        w.join(b, col("i_b") - col("i") >= m)
          .withColumn("d2", expr(d2))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("d2").asc, col("day"), col("day_b"))))
          .where(col("rk") === 1)
          .select(col("day").as("day_a"), col("day_b"),
            col("d2").as("motif_d2"))
      },
      Some(s"""WITH $windowsSql
              |SELECT a.day AS day_a, b.day AS day_b,
              |       CAST(${d2Sql("a", "b")} AS BIGINT) AS motif_d2
              |FROM w a JOIN w b ON b.i - a.i >= $m
              |ORDER BY ${d2Sql("a", "b")} ASC, a.day, b.day
              |LIMIT 1""".stripMargin)),

    // ── Split-leakage audit: q_decontaminate guards against BENCHMARK
    //    contamination; this guards against the quieter failure — the
    //    corpus's own val/test splits sharing content with train.
    //    Deterministic hash splits (Curation.splitAssign semantics),
    //    3-shingle overlap ≥ 10 flags a leaky doc; one row per eval
    //    split with the leak rate. Shingle join is inverted-index
    //    shaped (shingle-keyed), never doc×doc.
    QueryDef("q_split_leakage",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"),
            graft.ops.Curation.splitAssign(col("doc_id").cast("string"))
              .as("split"))
        // split is a pure hash of doc_id — recomputed after shingling
        // instead of joined back, so the index build stays one pass.
        val sh = graft.ops.Dedup.shingles(
            docs.select(col("doc_id"), col("text")), 3)
          .withColumn("split",
            graft.ops.Curation.splitAssign(col("doc_id").cast("string")))
          .select(col("doc_id"), col("split"), col("shingle"))
          .distinct()
          .localCheckpoint(false) // train index + eval probes
        val trainSh = sh.where(col("split") === "train")
          .select(col("shingle")).distinct()
        val evalDocs = docs.where(col("split") =!= "train")
          .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
        val shared = sh.where(col("split") =!= "train")
          .join(trainSh, "shingle")
          .groupBy(col("split"), col("doc_id"))
          .agg(count(lit(1)).as("n_shared"))
        val leaky = shared.where(col("n_shared") >= 10)
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_leaky"), max(col("n_shared")).as("worst"))
        evalDocs.join(leaky, Seq("split"), "left")
          .selectExpr("split",
            "n_docs",
            "coalesce(n_leaky, CAST(0 AS BIGINT)) AS n_leaky",
            "coalesce(n_leaky, CAST(0 AS BIGINT)) * 1000000 div n_docs" +
              " AS leak_rate_e6",
            "coalesce(worst, CAST(0 AS BIGINT)) AS worst_shared")
      },
      Some {
        val h = PortableSql.hash48("CAST(doc_id AS VARCHAR)", "'split'")
        s"""WITH base AS (SELECT doc_id, text,
           |         CASE WHEN $h % 100 < 90 THEN 'train'
           |              WHEN $h % 100 < 95 THEN 'val'
           |              ELSE 'test' END AS split
           |       FROM documents),
           |sh AS (SELECT DISTINCT doc_id, split, shingle FROM (
           |  SELECT doc_id, split,
           |         unnest(list_transform(range(1, len(ws) - 1),
           |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
           |           AS shingle
           |  FROM (SELECT doc_id, split, string_split(text, ' ') AS ws
           |        FROM base) w
           |  WHERE len(ws) >= 3)),
           |ts AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train'),
           |ed AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs
           |       FROM base WHERE split <> 'train' GROUP BY 1),
           |shared AS (SELECT split, doc_id,
           |                  CAST(count(*) AS BIGINT) AS n_shared
           |           FROM sh JOIN ts USING (shingle)
           |           WHERE split <> 'train' GROUP BY 1, 2),
           |leaky AS (SELECT split, CAST(count(*) AS BIGINT) AS n_leaky,
           |                 CAST(max(n_shared) AS BIGINT) AS worst
           |          FROM shared WHERE n_shared >= 10 GROUP BY 1)
           |SELECT ed.split, n_docs,
           |       coalesce(n_leaky, 0) AS n_leaky,
           |       coalesce(n_leaky, 0) * 1000000 // n_docs AS leak_rate_e6,
           |       coalesce(worst, 0) AS worst_shared
           |FROM ed LEFT JOIN leaky ON ed.split = leaky.split""".stripMargin
      }),

    // ── Vocabulary coverage curve: what fraction of token OCCURRENCES
    //    does a top-N vocabulary cover, for N ∈ {100, 500, 1000} — the
    //    number that sizes a tokenizer vocab (q_heaps gives growth;
    //    this gives the budget→coverage tradeoff). Rank window runs on
    //    the aggregated token-frequency axis (vocab-bounded).
    QueryDef("q_vocab_coverage",
      (s, d) => {
        val freq = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("w")).agg(count(lit(1)).as("f"))
        val ranked = freq
          .withColumn("rk", row_number().over(
            Window.orderBy(col("f").desc, col("w"))))
          .localCheckpoint(false) // three budgets + the total
        val tot = ranked.agg(sum(col("f")).as("total_occ"),
          count(lit(1)).as("n_vocab"))
        Seq(100, 500, 1000).map { n =>
          ranked.where(col("rk") <= n)
            .agg(sum(col("f")).as("covered"))
            .select(lit(n.toLong).as("vocab_budget"), col("covered"))
        }.reduce(_ unionByName _)
          .crossJoin(broadcast(tot))
          .selectExpr("vocab_budget", "covered", "total_occ", "n_vocab",
            "covered * 1000000 div total_occ AS coverage_e6")
      },
      Some("""WITH f AS (SELECT wd AS w, CAST(count(*) AS BIGINT) AS f
             |           FROM (SELECT unnest(string_split(text, ' ')) AS wd
             |                 FROM documents) u
             |           WHERE wd <> '' GROUP BY 1),
             |r AS (SELECT f, row_number() OVER (ORDER BY f DESC, w) AS rk
             |      FROM f),
             |t AS (SELECT CAST(sum(f) AS BIGINT) AS total_occ,
             |             CAST(count(*) AS BIGINT) AS n_vocab FROM r),
             |b AS (SELECT unnest([100, 500, 1000]) AS vocab_budget)
             |SELECT CAST(b.vocab_budget AS BIGINT) AS vocab_budget,
             |       CAST(sum(r.f) AS BIGINT) AS covered,
             |       t.total_occ, t.n_vocab,
             |       CAST(sum(r.f) AS BIGINT) * 1000000 // t.total_occ
             |         AS coverage_e6
             |FROM b JOIN r ON r.rk <= b.vocab_budget CROSS JOIN t
             |GROUP BY 1, 3, 4""".stripMargin))
  )
}
