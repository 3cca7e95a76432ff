package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-196 batch — distribution-free trend runs, cross-source n-gram
  * similarity, and two string-shape profiles:
  *
  *  - Runs up/down (`q_runs_updown`): sign sequence of consecutive-day
  *    revenue diffs (ties count as up, calendar gaps drop the pair —
  *    both documented) → observed runs vs the exchangeability
  *    expectation E[R] = (2n−1)/3 with Var = (16n−29)/90, plus the
  *    difference-sign count against m/2. The direction-only companion
  *    to q_records_count (levels) and q_rank_von_neumann (ranks);
  *    exact integers, one sqrt close.
  *  - Bigram overlap (`q_ngram_overlap`): pairwise word-bigram Jaccard
  *    and containment between sources — corpus-level near-duplication
  *    across feeds (the source-granular cousin of the doc-pair dedup
  *    family). Distinct-bigram frames join on the bigram key: one
  *    shuffle, source-pair grid bounded.
  *  - Word-length profile (`q_word_len_profile`): per language — token
  *    count, mean word length (e6), share of long (≥8 char) words, and
  *    the modal length with a smallest-length tie-break. All exact
  *    integers; mode via max-count argmax join, not a window.
  *  - Anagram classes (`q_anagram_groups`): group distinct tokens by
  *    sorted-letter signature — classes, multi-word classes, and the
  *    largest class size. Exercises the portable char-sort path
  *    (array_sort(split) / list_sort(string_split)); one exchange on
  *    the signature key.
  *
  * Scale shapes: the runs joins ride the calendar-bounded daily frame
  * (broadcast); bigram/signature frames shuffle on content keys with
  * distinct-level pre-aggregation — all partial-aggregable. */
object Round196Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Runs up/down + difference-sign on daily revenue.
    QueryDef("q_runs_updown",
      (s, d) => {
        val dl = Tables.orders(s, d)
          .groupBy(col("o_orderdate").as("dt"))
          .agg(sum(expr("CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT)"))
            .as("x"))
          .localCheckpoint(false) // calendar-bounded
        val diffs = dl.as("a").join(broadcast(dl.as("b")),
            expr("b.dt = date_add(a.dt, 1)"))
          .select(col("a.dt").as("dt"),
            when(col("b.x") >= col("a.x"), 1L).otherwise(-1L).as("sg"))
          .localCheckpoint(false)
        val chg = diffs.as("p").join(broadcast(diffs.as("q")),
            expr("q.dt = date_add(p.dt, 1)"))
          .agg(count(lit(1)).as("pairs"),
            sum(when(col("p.sg") =!= col("q.sg"), 1L).otherwise(0L))
              .as("changes"))
        val base = diffs.agg(count(lit(1)).as("m"),
          sum(when(col("sg") === 1L, 1L).otherwise(0L)).as("ups"))
        chg.crossJoin(broadcast(base))
          .selectExpr("m", "ups", "pairs", "changes",
            "changes + 1 AS runs",
            "(2 * (m + 1) - 1) * 1000000 div 3 AS e_runs_e6",
            """CASE WHEN 16 * (m + 1) - 29 <= 0 THEN NULL
              |WHEN (changes + 1) * 3 >= 2 * (m + 1) - 1
              |THEN CAST(round(CAST((changes + 1) * 3 - (2 * (m + 1) - 1)
              |    AS DOUBLE) / CAST('3.0' AS DOUBLE)
              |  / sqrt(CAST(16 * (m + 1) - 29 AS DOUBLE)
              |         / CAST('90.0' AS DOUBLE))
              |  * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
              |ELSE -CAST(round(CAST((2 * (m + 1) - 1) - (changes + 1) * 3
              |    AS DOUBLE) / CAST('3.0' AS DOUBLE)
              |  / sqrt(CAST(16 * (m + 1) - 29 AS DOUBLE)
              |         / CAST('90.0' AS DOUBLE))
              |  * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
              |END AS z_e6""".stripMargin)
      },
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS dt,
             |         CAST(sum(CAST(floor(o_totalprice / 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS x
             |  FROM orders GROUP BY 1),
             |diffs AS (SELECT a.dt,
             |            CASE WHEN b.x >= a.x THEN 1 ELSE -1 END AS sg
             |          FROM daily a JOIN daily b ON b.dt = a.dt + 1),
             |chg AS (SELECT CAST(count(*) AS BIGINT) AS pairs,
             |          CAST(sum(CASE WHEN p.sg <> q.sg THEN 1 ELSE 0 END)
             |            AS BIGINT) AS changes
             |        FROM diffs p JOIN diffs q ON q.dt = p.dt + 1),
             |base AS (SELECT CAST(count(*) AS BIGINT) AS m,
             |           CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END)
             |             AS BIGINT) AS ups FROM diffs)
             |SELECT m, ups, pairs, changes,
             |       changes + 1 AS runs,
             |       (2 * (m + 1) - 1) * 1000000 // 3 AS e_runs_e6,
             |       CASE WHEN 16 * (m + 1) - 29 <= 0 THEN NULL
             |       WHEN (changes + 1) * 3 >= 2 * (m + 1) - 1
             |       THEN CAST(round(CAST((changes + 1) * 3
             |           - (2 * (m + 1) - 1) AS DOUBLE)
             |         / CAST('3.0' AS DOUBLE)
             |         / sqrt(CAST(16 * (m + 1) - 29 AS DOUBLE)
             |                / CAST('90.0' AS DOUBLE))
             |         * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
             |       ELSE -CAST(round(CAST((2 * (m + 1) - 1)
             |           - (changes + 1) * 3 AS DOUBLE)
             |         / CAST('3.0' AS DOUBLE)
             |         / sqrt(CAST(16 * (m + 1) - 29 AS DOUBLE)
             |                / CAST('90.0' AS DOUBLE))
             |         * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
             |       END AS z_e6
             |FROM chg CROSS JOIN base""".stripMargin)),

    // ── Pairwise word-bigram Jaccard/containment across sources.
    QueryDef("q_ngram_overlap",
      (s, d) => {
        val bg = Tables.documents(s, d)
          .select(col("source"), split(col("text"), " ").as("ws"))
          .where(size(col("ws")) >= 2)
          .select(col("source"), explode(expr(
            "transform(sequence(0, size(ws) - 2)," +
              " i -> concat(ws[i], ' ', ws[i + 1]))")).as("b"))
          .distinct()
          .localCheckpoint(false) // distinct (source, bigram)
        val sizes = bg.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val inter = bg.as("x").join(bg.as("y"), Seq("b"))
          .where(col("x.source") < col("y.source"))
          .groupBy(col("x.source").as("s1"), col("y.source").as("s2"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(broadcast(sizes.select(col("source").as("s1"),
            col("n").as("n1"))), Seq("s1"))
          .join(broadcast(sizes.select(col("source").as("s2"),
            col("n").as("n2"))), Seq("s2"))
          .selectExpr("s1", "s2", "inter", "n1", "n2",
            "inter * 1000000 div (n1 + n2 - inter) AS jaccard_e6",
            """CASE WHEN n1 <= n2
              |THEN inter * 1000000 div n1
              |ELSE inter * 1000000 div n2
              |END AS containment_e6""".stripMargin)
      },
      Some("""WITH t AS MATERIALIZED (
             |  SELECT source, string_split(text, ' ') AS ws
             |  FROM documents),
             |bg AS MATERIALIZED (
             |  SELECT DISTINCT source,
             |    unnest(list_transform(generate_series(1, len(ws) - 1),
             |      i -> concat(ws[i], ' ', ws[i + 1]))) AS b
             |  FROM t WHERE len(ws) >= 2),
             |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
             |          FROM bg GROUP BY 1),
             |inter AS (SELECT x.source AS s1, y.source AS s2,
             |            CAST(count(*) AS BIGINT) AS inter
             |          FROM bg x JOIN bg y ON x.b = y.b
             |          WHERE x.source < y.source GROUP BY 1, 2)
             |SELECT s1, s2, inter, a.n AS n1, c.n AS n2,
             |       inter * 1000000 // (a.n + c.n - inter) AS jaccard_e6,
             |       CASE WHEN a.n <= c.n
             |       THEN inter * 1000000 // a.n
             |       ELSE inter * 1000000 // c.n
             |       END AS containment_e6
             |FROM inter JOIN sizes a ON a.source = s1
             |JOIN sizes c ON c.source = s2""".stripMargin)),

    // ── Word-length profile per language.
    QueryDef("q_word_len_profile",
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(col("lang"),
            explode(split(col("text"), " ")).as("w"))
          .where(length(col("w")) >= 1)
          .select(col("lang"), length(col("w")).cast("long").as("len"))
        val byLen = words.groupBy(col("lang"), col("len"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // langs × lengths grid
        val prof = byLen.groupBy(col("lang"))
          .agg(sum(col("c")).as("n"),
            sum(col("len") * col("c")).as("sl"),
            sum(when(col("len") >= 8L, col("c")).otherwise(0L))
              .as("long_c"),
            max(col("c")).as("maxc"))
        prof.join(byLen, Seq("lang"))
          .where(col("c") === col("maxc"))
          .groupBy(col("lang"), col("n"), col("sl"), col("long_c"))
          .agg(min(col("len")).as("modal_len"))
          .selectExpr("lang", "n",
            "sl * 1000000 div n AS mean_len_e6",
            "long_c * 1000000 div n AS long_share_e6",
            "modal_len")
      },
      Some("""WITH words AS (
             |  SELECT lang, unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |w2 AS (SELECT lang, CAST(length(w) AS BIGINT) AS len
             |       FROM words WHERE length(w) >= 1),
             |bylen AS (SELECT lang, len, CAST(count(*) AS BIGINT) AS c
             |          FROM w2 GROUP BY 1, 2),
             |prof AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n,
             |           CAST(sum(len * c) AS BIGINT) AS sl,
             |           CAST(sum(CASE WHEN len >= 8 THEN c ELSE 0 END)
             |             AS BIGINT) AS long_c,
             |           CAST(max(c) AS BIGINT) AS maxc
             |         FROM bylen GROUP BY 1)
             |SELECT p.lang, p.n,
             |       p.sl * 1000000 // p.n AS mean_len_e6,
             |       p.long_c * 1000000 // p.n AS long_share_e6,
             |       min(b.len) AS modal_len
             |FROM prof p JOIN bylen b
             |  ON b.lang = p.lang AND b.c = p.maxc
             |GROUP BY 1, 2, 3, 4""".stripMargin)),

    // ── Anagram signature classes over the distinct vocabulary.
    QueryDef("q_anagram_groups",
      (s, d) => {
        val vocab = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("w"))
          .where(length(col("w")) >= 2)
          .distinct()
        val classes = vocab
          .select(expr("array_join(array_sort(split(w, '')), '')")
            .as("sig"))
          .groupBy(col("sig")).agg(count(lit(1)).as("nw"))
        classes.agg(count(lit(1)).as("classes"),
          sum(when(col("nw") >= 2L, 1L).otherwise(0L))
            .as("multi_classes"),
          max(col("nw")).as("max_class"),
          sum(col("nw")).as("vocab"))
      },
      Some("""WITH vocab AS (
             |  SELECT DISTINCT unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |v2 AS (SELECT w FROM vocab WHERE length(w) >= 2),
             |classes AS (
             |  SELECT array_to_string(list_sort(string_split(w, '')), '')
             |           AS sig,
             |         CAST(count(*) AS BIGINT) AS nw
             |  FROM v2 GROUP BY 1)
             |SELECT CAST(count(*) AS BIGINT) AS classes,
             |       CAST(sum(CASE WHEN nw >= 2 THEN 1 ELSE 0 END)
             |         AS BIGINT) AS multi_classes,
             |       CAST(max(nw) AS BIGINT) AS max_class,
             |       CAST(sum(nw) AS BIGINT) AS vocab
             |FROM classes""".stripMargin))
  )
}
