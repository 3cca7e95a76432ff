package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Sketches}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-181 batch — distribution distance, generation-quality overlap
  * metrics, and lexical-richness/readability curation gates:
  *
  *  - 1-D Wasserstein (`q_wasserstein_1d`): earth-mover distance between
  *    the urgent-vs-relaxed order-value distributions on a bounded
  *    thousand-dollar bucket axis. W₁ = Σ |F₁−F₂|·Δv over the sorted
  *    axis, kept exact as Σ |cum₁·n₂ − cum₂·n₁|·gap div (n₁·n₂) — the
  *    histogram form every sketch-based EMD uses at scale.
  *  - ROUGE-2 (`q_rouge2`) / BLEU-2 (`q_bleu2`): reference-overlap
  *    metrics over deterministic (even, odd) doc pairs — the corpus
  *    ships an even contiguous doc_id range at every SF, so every even
  *    doc has its odd reference. ROUGE-2 is micro recall of clipped
  *    bigram matches (exact integers); BLEU-2 is the clipped 1/2-gram
  *    precision geometric mean × brevity penalty, closed in the repo's
  *    e6 log₂/pow₂ fixed point (add-one clamp on zero match counts,
  *    documented below).
  *  - Yule's K (`q_yule_k`): frequency-spectrum lexical richness per
  *    source, K = 10⁴·(Σm²V(m) − N)/N² — exact integers end to end.
  *  - Linear-kernel MMD (`q_mmd_linear`): ‖μ₀−μ₁‖² between label-0 and
  *    label-1 embedding clouds — the distribution-shift statistic of
  *    two-sample testing. Per-element e4 quantization (the portable
  *    per-scalar round) keeps every per-dim sum integer; the closing
  *    ratio is one decimal division.
  *  - Pietra index (`q_pietra`): max Lorenz-diagonal gap
  *    Σ|x−μ|/(2Σx) over order values — the robust inequality reading
  *    next to q_gini, exact as Σ|n·x−S| div (2·n·S).
  *  - Readability panel (`q_readability`): Flesch-Kincaid grade,
  *    Coleman-Liau, and LIX per source in e3 fixed point. The corpus
  *    has no sentence punctuation, so each document reads as ONE
  *    sentence (stated contract — the panel then ranks sources by
  *    run-on severity, a useful curation gate as-is).
  *  - Herdan/Guiraud (`q_herdan_guiraud`): vocabulary-growth exponents
  *    per source — C = log V/log N (base cancels → exact e6 ratio of
  *    the shared integer log₂) and R = V/√N (one portable double).
  *  - Bartlett's test (`q_bartlett`): variance homogeneity of order
  *    values across the 5 priority classes — integer group variances,
  *    the shared fixed-point log₂ scaled to ln by ·ln2, and the
  *    standard C correction in e6.
  *
  * Scale shapes: every query is one or two full-scan aggregations onto
  * a bounded axis (≤ ~500 value buckets / 20 sources / 64 dims / 5
  * priority classes); the pair joins (ROUGE/BLEU) are equi-joins on
  * (pair, gram) — never cross joins.
  */
object Round181Queries {

  private val dec = "decimal(38,0)"

  /** (pair, role, tok) token-array frame over deterministic doc pairs:
    * hypothesis = even doc_id, reference = the odd doc_id right after. */
  private def pairedDocs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .select(expr("doc_id div 2").as("pair"),
        (col("doc_id") % 2).as("role"),
        split(col("text"), " ").as("tok"))

  private val bigramsExpr =
    "transform(sequence(1, size(tok) - 1), " +
      "i -> concat(element_at(tok, i), ' ', element_at(tok, i + 1)))"

  /** DuckDB twin of [[pairedDocs]] + n-gram counts. */
  private val pairSqlHead =
    """pd AS (SELECT doc_id // 2 AS pair, doc_id % 2 AS role,
      |              string_split(text, ' ') AS tok
      |       FROM documents),
      |uni AS (SELECT pair, role, unnest(tok) AS w FROM pd),
      |ucnt AS (SELECT pair, role, w, CAST(count(*) AS BIGINT) AS c
      |         FROM uni GROUP BY 1, 2, 3),
      |big AS (SELECT pair, role,
      |               unnest(list_transform(range(1, len(tok)),
      |                 i -> tok[i] || ' ' || tok[i + 1])) AS w
      |        FROM pd),
      |bcnt AS (SELECT pair, role, w, CAST(count(*) AS BIGINT) AS c
      |         FROM big GROUP BY 1, 2, 3)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── 1-D Wasserstein between urgent (1-URGENT/2-HIGH) and relaxed
    //    order-value distributions, thousand-dollar buckets.
    QueryDef("q_wasserstein_1d",
      (s, d) => {
        val g = Tables.orders(s, d)
          .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)" +
            " div 100000").as("bucket"),
            col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("urgent"))
          .groupBy(col("bucket"))
          .agg(sum(when(col("urgent"), 1L).otherwise(0L)).as("ca"),
            sum(when(col("urgent"), 0L).otherwise(1L)).as("cb"))
        val tot = g.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        val w = Window.orderBy(col("bucket"))
        g.crossJoin(broadcast(tot))
          .withColumn("cum_a", sum(col("ca")).over(w))
          .withColumn("cum_b", sum(col("cb")).over(w))
          .withColumn("gap",
            coalesce(lead(col("bucket"), 1).over(w) - col("bucket"), lit(0L)))
          .agg(count(lit(1)).as("n_buckets"), max(col("na")).as("na"),
            max(col("nb")).as("nb"),
            sum(expr(s"abs(CAST(cum_a AS $dec) * nb" +
              s" - CAST(cum_b AS $dec) * na) * gap")).as("s"))
          .selectExpr("na", "nb", "n_buckets",
            s"CAST(s * 1000000 div (CAST(na AS $dec) * nb) AS BIGINT)" +
              " AS w1_buckets_e6")
      },
      Some("""WITH b AS (
             |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |           // 100000 AS bucket,
             |         o_orderpriority IN ('1-URGENT', '2-HIGH') AS urgent
             |  FROM orders),
             |g AS (SELECT bucket,
             |        CAST(sum(CASE WHEN urgent THEN 1 ELSE 0 END)
             |          AS BIGINT) AS ca,
             |        CAST(sum(CASE WHEN urgent THEN 0 ELSE 1 END)
             |          AS BIGINT) AS cb
             |      FROM b GROUP BY 1),
             |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
             |               CAST(sum(cb) AS BIGINT) AS nb FROM g),
             |c AS (SELECT bucket, ca, cb, na, nb,
             |        sum(ca) OVER (ORDER BY bucket) AS cum_a,
             |        sum(cb) OVER (ORDER BY bucket) AS cum_b,
             |        coalesce(lead(bucket) OVER (ORDER BY bucket)
             |          - bucket, 0) AS gap
             |      FROM g CROSS JOIN tot),
             |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
             |          max(na) AS na, max(nb) AS nb,
             |          sum(abs(CAST(cum_a AS HUGEINT) * nb
             |            - CAST(cum_b AS HUGEINT) * na) * gap) AS s
             |        FROM c)
             |SELECT na, nb, n_buckets,
             |       CAST(s * 1000000 // (CAST(na AS HUGEINT) * nb)
             |         AS BIGINT) AS w1_buckets_e6
             |FROM agg""".stripMargin)),

    // ── ROUGE-2 micro recall over the (even, odd) doc pairs.
    QueryDef("q_rouge2",
      (s, d) => {
        val pd = pairedDocs(s, d)
        val bcnt = pd.filter(size(col("tok")) >= 2)
          .select(col("pair"), col("role"),
            explode(expr(bigramsExpr)).as("w"))
          .groupBy(col("pair"), col("role"), col("w"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // shared by match + ref-total legs
        val h = bcnt.filter(col("role") === 0)
          .select(col("pair"), col("w"), col("c").as("hc"))
        val r = bcnt.filter(col("role") === 1)
          .select(col("pair"), col("w"), col("c").as("rc"))
        val m = h.join(r, Seq("pair", "w"))
          .agg(sum(least(col("hc"), col("rc"))).as("match2"))
        val rt = r.agg(sum(col("rc")).as("ref2"),
          countDistinct(col("pair")).as("n_pairs"))
        m.crossJoin(broadcast(rt))
          .selectExpr("n_pairs", "match2", "ref2",
            "match2 * 1000000 div ref2 AS rouge2_recall_e6")
      },
      Some(s"""WITH $pairSqlHead,
              |m AS (SELECT CAST(sum(least(h.c, r.c)) AS BIGINT) AS match2
              |      FROM bcnt h JOIN bcnt r
              |        ON h.pair = r.pair AND h.w = r.w
              |       AND h.role = 0 AND r.role = 1),
              |rt AS (SELECT CAST(sum(c) AS BIGINT) AS ref2,
              |              CAST(count(DISTINCT pair) AS BIGINT) AS n_pairs
              |       FROM bcnt WHERE role = 1)
              |SELECT n_pairs, match2, ref2,
              |       match2 * 1000000 // ref2 AS rouge2_recall_e6
              |FROM m CROSS JOIN rt""".stripMargin)),

    // ── Corpus BLEU-2 (clipped 1/2-gram precisions, brevity penalty) in
    //    the e6 log₂/pow₂ fixed point; zero match counts clamp to 1
    //    (the add-one guard the FS weights also use).
    QueryDef("q_bleu2",
      (s, d) => {
        val pd = pairedDocs(s, d)
        val ucnt = pd.select(col("pair"), col("role"),
            explode(col("tok")).as("w"))
          .groupBy(col("pair"), col("role"), col("w"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(false)
        val bcnt = pd.filter(size(col("tok")) >= 2)
          .select(col("pair"), col("role"),
            explode(expr(bigramsExpr)).as("w"))
          .groupBy(col("pair"), col("role"), col("w"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(false)
        def clipped(cnt: org.apache.spark.sql.DataFrame) =
          cnt.filter(col("role") === 0)
            .select(col("pair"), col("w"), col("c").as("hc"))
            .join(cnt.filter(col("role") === 1)
              .select(col("pair"), col("w"), col("c").as("rc")),
              Seq("pair", "w"))
            .agg(sum(least(col("hc"), col("rc"))).as("m"))
        val m1 = clipped(ucnt).selectExpr("m AS m1")
        val m2 = clipped(bcnt).selectExpr("m AS m2")
        val lens = pd.select(col("role"), size(col("tok")).cast("long").as("n"))
          .groupBy(col("role")).agg(sum(col("n")).as("len"))
        val c = lens.filter(col("role") === 0).selectExpr("len AS c_len")
        val r = lens.filter(col("role") === 1).selectExpr("len AS r_len")
        val h2t = bcnt.filter(col("role") === 0)
          .agg(sum(col("c")).as("h2t"))
        val np = pd.agg(countDistinct(col("pair")).as("n_pairs"))
        m1.crossJoin(broadcast(m2)).crossJoin(broadcast(c))
          .crossJoin(broadcast(r)).crossJoin(broadcast(h2t))
          .crossJoin(broadcast(np))
          // c_len is also the unigram hypothesis total
          .withColumn("bp_y",
            expr("CASE WHEN c_len >= r_len THEN 0L" +
              " ELSE (r_len - c_len) * 1442695L div c_len END"))
          .withColumn("bp_e6", Sketches.pow2NegE6Expr("bp_y"))
          .withColumn("g0",
            Bm25.log2E6(col("c_len")) -
              Bm25.log2E6(greatest(col("m1"), lit(1L))) +
              Bm25.log2E6(col("h2t")) -
              Bm25.log2E6(greatest(col("m2"), lit(1L))))
          .withColumn("g", expr("g0 div 2"))
          .withColumn("geo_e6", Sketches.pow2NegE6Expr("g"))
          .selectExpr("n_pairs", "c_len", "r_len",
            "m1 * 1000000 div c_len AS p1_e6",
            "m2 * 1000000 div h2t AS p2_e6", "bp_e6",
            s"CAST(CAST(bp_e6 AS $dec) * geo_e6 div 1000000 AS BIGINT)" +
              " AS bleu2_e6")
      },
      Some {
        val bp = Sketches.pow2NegE6Sql("bp_y")
        val geo = Sketches.pow2NegE6Sql("g")
        def lg(x: String) = Bm25.log2E6Sql(x)
        s"""WITH $pairSqlHead,
           |m1 AS (SELECT CAST(sum(least(h.c, r.c)) AS BIGINT) AS m1
           |       FROM ucnt h JOIN ucnt r
           |         ON h.pair = r.pair AND h.w = r.w
           |        AND h.role = 0 AND r.role = 1),
           |m2 AS (SELECT CAST(sum(least(h.c, r.c)) AS BIGINT) AS m2
           |       FROM bcnt h JOIN bcnt r
           |         ON h.pair = r.pair AND h.w = r.w
           |        AND h.role = 0 AND r.role = 1),
           |lens AS (SELECT role, CAST(sum(len(tok)) AS BIGINT) AS len
           |         FROM pd GROUP BY 1),
           |h2t AS (SELECT CAST(sum(c) AS BIGINT) AS h2t
           |        FROM bcnt WHERE role = 0),
           |np AS (SELECT CAST(count(DISTINCT pair) AS BIGINT) AS n_pairs
           |       FROM pd),
           |base AS (SELECT n_pairs, m1, m2, h2t,
           |           (SELECT len FROM lens WHERE role = 0) AS c_len,
           |           (SELECT len FROM lens WHERE role = 1) AS r_len
           |         FROM m1 CROSS JOIN m2 CROSS JOIN h2t CROSS JOIN np),
           |e1 AS (SELECT *, CASE WHEN c_len >= r_len THEN 0
           |         ELSE (r_len - c_len) * 1442695 // c_len END AS bp_y
           |       FROM base),
           |e2 AS (SELECT *, $bp AS bp_e6,
           |         (${lg("c_len")} - ${lg("greatest(m1, 1)")}
           |          + ${lg("h2t")} - ${lg("greatest(m2, 1)")}) // 2 AS g
           |       FROM e1)
           |SELECT n_pairs, c_len, r_len,
           |       m1 * 1000000 // c_len AS p1_e6,
           |       m2 * 1000000 // h2t AS p2_e6, bp_e6,
           |       CAST(CAST(bp_e6 AS HUGEINT) * $geo // 1000000 AS BIGINT)
           |         AS bleu2_e6
           |FROM e2""".stripMargin
      }),

    // ── Yule's K per source: 10⁴·(Σm²V(m) − N)/N², e6.
    QueryDef("q_yule_k",
      (s, d) => Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("m"))
        .groupBy(col("source"))
        .agg(sum(col("m")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(expr(s"CAST(m AS $dec) * m")).as("s2"))
        .selectExpr("source", "n_tokens", "vocab",
          s"CAST((s2 - n_tokens) * 10000000000" +
            s" div (CAST(n_tokens AS $dec) * n_tokens) AS BIGINT)" +
            " AS yule_k_e6"),
      Some("""WITH wc AS (
             |  SELECT source, w, CAST(count(*) AS BIGINT) AS m
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
             |        FROM documents)
             |  GROUP BY 1, 2),
             |agg AS (SELECT source, CAST(sum(m) AS BIGINT) AS n_tokens,
             |          CAST(count(*) AS BIGINT) AS vocab,
             |          sum(CAST(m AS HUGEINT) * m) AS s2
             |        FROM wc GROUP BY 1)
             |SELECT source, n_tokens, vocab,
             |       CAST((s2 - n_tokens) * 10000000000
             |         // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT)
             |         AS yule_k_e6
             |FROM agg""".stripMargin)),

    // ── Linear-kernel MMD² between label-0 and label-1 embeddings.
    QueryDef("q_mmd_linear",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .filter(col("label").isin(0, 1))
          .select(col("label"),
            expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
              "x -> CAST(floor(x * 10000 + 0.5) AS BIGINT))").as("v"))
          .localCheckpoint(false) // shared by the dim sums + group counts
        val n = e.groupBy()
          .agg(sum(when(col("label") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("label") === 1, 1L).otherwise(0L)).as("n1"))
        val dims = e.select(col("label"), posexplode(col("v")))
          .groupBy(col("pos"))
          .agg(sum(when(col("label") === 0, col("col")).otherwise(0L))
            .as("s0"),
            sum(when(col("label") === 1, col("col")).otherwise(0L))
              .as("s1"))
        dims.crossJoin(broadcast(n))
          .agg(max(col("n0")).as("n0"), max(col("n1")).as("n1"),
            sum(expr(s"(CAST(s0 AS $dec) * n1 - CAST(s1 AS $dec) * n0)" +
              s" * (CAST(s0 AS $dec) * n1 - CAST(s1 AS $dec) * n0)"))
              .as("t"))
          .selectExpr("n0", "n1",
            s"CAST(t div (CAST(n0 AS $dec) * n1 * n0 * n1 * 100)" +
              " AS BIGINT) AS mmd2_e6")
      },
      Some("""WITH e AS (
             |  SELECT label,
             |         list_transform(CAST(embedding AS DOUBLE[]),
             |           x -> CAST(floor(x * 10000 + 0.5) AS BIGINT)) AS v
             |  FROM embeddings WHERE label IN (0, 1)),
             |n AS (SELECT CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)
             |               AS BIGINT) AS n0,
             |             CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)
             |               AS BIGINT) AS n1 FROM e),
             |ex AS (SELECT label, unnest(v) AS x,
             |              unnest(range(1, len(v) + 1)) AS i FROM e),
             |dims AS (SELECT i,
             |           CAST(sum(CASE WHEN label = 0 THEN x ELSE 0 END)
             |             AS BIGINT) AS s0,
             |           CAST(sum(CASE WHEN label = 1 THEN x ELSE 0 END)
             |             AS BIGINT) AS s1
             |         FROM ex GROUP BY 1),
             |agg AS (SELECT max(n0) AS n0, max(n1) AS n1,
             |          sum((CAST(s0 AS HUGEINT) * n1
             |               - CAST(s1 AS HUGEINT) * n0)
             |            * (CAST(s0 AS HUGEINT) * n1
             |               - CAST(s1 AS HUGEINT) * n0)) AS t
             |        FROM dims CROSS JOIN n)
             |SELECT n0, n1,
             |       CAST(t // (CAST(n0 AS HUGEINT) * n1 * n0 * n1 * 100)
             |         AS BIGINT) AS mmd2_e6
             |FROM agg""".stripMargin)),

    // ── Pietra inequality index over order values: Σ|n·x−S| / (2·n·S).
    QueryDef("q_pietra",
      (s, d) => {
        val x = Tables.orders(s, d)
          .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("x"))
        val tot = x.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        x.crossJoin(broadcast(tot))
          .agg(max(col("n")).as("n"), max(col("sx")).as("sum_cents"),
            sum(expr(s"abs(CAST(n AS $dec) * x - sx)")).as("dev"))
          .selectExpr("n", "sum_cents",
            s"CAST(dev * 1000000 div (CAST(n AS $dec) * sum_cents * 2)" +
              " AS BIGINT) AS pietra_e6")
      },
      Some("""WITH x AS (
             |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x
             |  FROM orders),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS sx FROM x),
             |agg AS (SELECT max(n) AS n, max(sx) AS sum_cents,
             |          sum(abs(CAST(n AS HUGEINT) * x - sx)) AS dev
             |        FROM x CROSS JOIN tot)
             |SELECT n, sum_cents,
             |       CAST(dev * 1000000
             |         // (CAST(n AS HUGEINT) * sum_cents * 2) AS BIGINT)
             |         AS pietra_e6
             |FROM agg""".stripMargin)),

    // ── Readability panel per source (doc = one sentence; no
    //    punctuation in the corpus). FK / CLI / LIX in e3.
    QueryDef("q_readability",
      (s, d) => Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("w"),
          length(regexp_replace(col("text"), "[^a-z]", "")).cast("long")
            .as("ch"),
          (length(regexp_replace(col("text"), "[aeiouy]+", "#")) -
            length(regexp_replace(regexp_replace(col("text"),
              "[aeiouy]+", "#"), "#", ""))).cast("long").as("syl"),
          expr("CAST(size(filter(split(text, ' '), " +
            "t -> length(t) > 6)) AS BIGINT)").as("lw"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("words"),
          sum(col("ch")).as("chars"), sum(col("syl")).as("syllables"),
          sum(col("lw")).as("long_words"))
        .selectExpr("source", "n_docs", "words", "chars", "syllables",
          "long_words",
          "390L * words div n_docs + 11800L * syllables div words" +
            " - 15590L AS fk_e3",
          "5880L * chars div words - 29600L * n_docs div words" +
            " - 15800L AS cli_e3",
          "words * 1000L div n_docs + long_words * 100000L div words" +
            " AS lix_e3"),
      Some("""WITH per AS (
             |  SELECT source,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
             |         CAST(length(regexp_replace(text, '[^a-z]', '', 'g'))
             |           AS BIGINT) AS ch,
             |         CAST(length(regexp_replace(text, '[aeiouy]+', '#',
             |             'g'))
             |           - length(replace(regexp_replace(text, '[aeiouy]+',
             |               '#', 'g'), '#', '')) AS BIGINT) AS syl,
             |         CAST(len(list_filter(string_split(text, ' '),
             |           t -> length(t) > 6)) AS BIGINT) AS lw
             |  FROM documents),
             |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |          CAST(sum(w) AS BIGINT) AS words,
             |          CAST(sum(ch) AS BIGINT) AS chars,
             |          CAST(sum(syl) AS BIGINT) AS syllables,
             |          CAST(sum(lw) AS BIGINT) AS long_words
             |        FROM per GROUP BY 1)
             |SELECT source, n_docs, words, chars, syllables, long_words,
             |       390 * words // n_docs + 11800 * syllables // words
             |         - 15590 AS fk_e3,
             |       5880 * chars // words - 29600 * n_docs // words
             |         - 15800 AS cli_e3,
             |       words * 1000 // n_docs + long_words * 100000 // words
             |         AS lix_e3
             |FROM agg""".stripMargin)),

    // ── Herdan's C + Guiraud's R per source.
    QueryDef("q_herdan_guiraud",
      (s, d) => Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("m"))
        .groupBy(col("source"))
        .agg(sum(col("m")).as("n_tokens"), count(lit(1)).as("vocab"))
        .withColumn("lv", Bm25.log2E6(col("vocab")))
        .withColumn("ln", Bm25.log2E6(col("n_tokens")))
        .selectExpr("source", "n_tokens", "vocab",
          "CASE WHEN n_tokens < 2 THEN NULL" +
            " ELSE lv * 1000000 div ln END AS herdan_c_e6",
          "round(CAST(vocab AS DOUBLE)" +
            " / sqrt(CAST(n_tokens AS DOUBLE)), 6) AS guiraud_r"),
      Some {
        val lv = Bm25.log2E6Sql("vocab")
        val ln = Bm25.log2E6Sql("n_tokens")
        s"""WITH wc AS (
           |  SELECT source, w, CAST(count(*) AS BIGINT) AS m
           |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
           |        FROM documents)
           |  GROUP BY 1, 2),
           |agg AS (SELECT source, CAST(sum(m) AS BIGINT) AS n_tokens,
           |          CAST(count(*) AS BIGINT) AS vocab
           |        FROM wc GROUP BY 1)
           |SELECT source, n_tokens, vocab,
           |       CASE WHEN n_tokens < 2 THEN NULL
           |       ELSE CAST(CAST($lv AS BIGINT) * 1000000 // $ln
           |         AS BIGINT) END AS herdan_c_e6,
           |       round(CAST(vocab AS DOUBLE)
           |         / sqrt(CAST(n_tokens AS DOUBLE)), 6) AS guiraud_r
           |FROM agg""".stripMargin
      }),

    // ── Bartlett's variance-homogeneity test across priority classes.
    QueryDef("q_bartlett",
      (s, d) => {
        val g = Tables.orders(s, d)
          .select(col("o_orderpriority").as("pri"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
              .as("x"))
          .groupBy(col("pri"))
          .agg(count(lit(1)).as("ni"), sum(col("x")).as("si"),
            sum(expr(s"CAST(x AS $dec) * x")).as("qi"))
          .filter(col("ni") >= 2L)
          .withColumn("si2",
            expr(s"CAST((CAST(ni AS $dec) * qi - CAST(si AS $dec) * si)" +
              s" div (CAST(ni AS $dec) * (ni - 1)) AS BIGINT)"))
          .withColumn("l_si2", Bm25.log2E6(greatest(col("si2"), lit(1L))))
        val t = g.agg(count(lit(1)).as("k"), sum(col("ni")).as("n"),
          sum(expr(s"CAST(ni - 1 AS $dec) * si2")).as("wss"),
          sum(expr("(ni - 1) * l_si2")).as("sl"),
          sum(expr("1000000 div (ni - 1)")).as("rinv"))
        t.withColumn("sp2",
            expr(s"CAST(wss div CAST(n - k AS $dec) AS BIGINT)"))
          .withColumn("m_e6",
            (col("n") - col("k")) * Bm25.log2E6(greatest(col("sp2"),
              lit(1L))) - col("sl"))
          .selectExpr("k", "n",
            s"CAST(CAST(m_e6 AS $dec) * 693147 div 1000000 AS BIGINT)" +
              " AS m_ln_e6",
            "1000000 + (rinv - 1000000 div (n - k)) div (3 * (k - 1))" +
              " AS c_e6")
          .selectExpr("k", "n", "m_ln_e6", "c_e6",
            s"CAST(CAST(m_ln_e6 AS $dec) * 1000000 div c_e6 AS BIGINT)" +
              " AS bartlett_e6")
      },
      Some {
        val lsi2 = Bm25.log2E6Sql("greatest(si2, 1)")
        val lsp2 = Bm25.log2E6Sql("greatest(sp2, 1)")
        s"""WITH g0 AS (
           |  SELECT o_orderpriority AS pri,
           |         CAST(count(*) AS BIGINT) AS ni,
           |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
           |           AS BIGINT)) AS BIGINT) AS si,
           |         sum(CAST(CAST(floor(o_totalprice * 100 + 0.5)
           |           AS BIGINT) AS HUGEINT)
           |           * CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |           AS qi
           |  FROM orders GROUP BY 1 HAVING count(*) >= 2),
           |g AS (SELECT pri, ni, si,
           |        CAST((CAST(ni AS HUGEINT) * qi
           |          - CAST(si AS HUGEINT) * si)
           |          // (CAST(ni AS HUGEINT) * (ni - 1)) AS BIGINT) AS si2
           |      FROM g0),
           |g2 AS (SELECT *, $lsi2 AS l_si2 FROM g),
           |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
           |        CAST(sum(ni) AS BIGINT) AS n,
           |        sum(CAST(ni - 1 AS HUGEINT) * si2) AS wss,
           |        CAST(sum((ni - 1) * l_si2) AS BIGINT) AS sl,
           |        CAST(sum(1000000 // (ni - 1)) AS BIGINT) AS rinv
           |      FROM g2),
           |t2 AS (SELECT *, CAST(wss // CAST(n - k AS HUGEINT) AS BIGINT)
           |         AS sp2 FROM t),
           |t3 AS (SELECT *, (n - k) * $lsp2 - sl AS m_e6 FROM t2),
           |t4 AS (SELECT k, n,
           |         CAST(CAST(m_e6 AS HUGEINT) * 693147 // 1000000
           |           AS BIGINT) AS m_ln_e6,
           |         1000000 + (rinv - 1000000 // (n - k))
           |           // (3 * (k - 1)) AS c_e6
           |       FROM t3)
           |SELECT k, n, m_ln_e6, c_e6,
           |       CAST(CAST(m_ln_e6 AS HUGEINT) * 1000000 // c_e6
           |         AS BIGINT) AS bartlett_e6
           |FROM t4""".stripMargin
      })
  )
}
