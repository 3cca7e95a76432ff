package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.{Multimodal, TextAnalysis}

/** Text-analysis and multimodal-plumbing queries over `documents`. */
object TextQueries {

  private def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString("[", ", ", "]")
  private val en = TextAnalysis.stopwords.toMap.apply("en")
  private val es = TextAnalysis.stopwords.toMap.apply("es")
  private val de = TextAnalysis.stopwords.toMap.apply("de")

  private val hitsSql =
    s"""SELECT doc_id, lang, text,
       |       CAST(len(list_filter(ws, w -> list_contains(${inList(en)}, w))) AS BIGINT) AS hits_en,
       |       CAST(len(list_filter(ws, w -> list_contains(${inList(es)}, w))) AS BIGINT) AS hits_es,
       |       CAST(len(list_filter(ws, w -> list_contains(${inList(de)}, w))) AS BIGINT) AS hits_de,
       |       CAST(len(ws) AS BIGINT) AS n_words
       |FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS ws FROM documents) t""".stripMargin

  private val predSql =
    """CASE WHEN hits_en + hits_es + hits_de = 0 THEN 'unknown'
      |     WHEN hits_en >= hits_es AND hits_en >= hits_de THEN 'en'
      |     WHEN hits_es >= hits_de THEN 'es'
      |     ELSE 'de' END""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── Heuristic language ID, reported as a confusion matrix against the
    //    corpus labels.
    QueryDef("q_text_langid",
      (s, d) => TextAnalysis.langId(Tables.documents(s, d))
        .groupBy(col("lang").as("actual_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("cnt")),
      Some(s"""SELECT lang AS actual_lang, $predSql AS pred_lang, count(*) AS cnt
              |FROM ($hitsSql) h GROUP BY 1, 2""".stripMargin)),

    // ── Quality features + weighted composite score.
    QueryDef("q_text_quality",
      (s, d) => TextAnalysis.quality(Tables.documents(s, d))
        .select(col("doc_id"), col("n_words"), col("mean_wlen"),
          col("stop_ratio"), col("alpha_ratio"), col("quality")),
      Some(s"""SELECT doc_id, n_words, mean_wlen, stop_ratio, alpha_ratio,
              |       round((alpha_ratio * 4 + stop_ratio * 3 +
              |              least(CAST('1.0' AS DOUBLE),
              |                    CAST(n_words AS DOUBLE) / CAST('100.0' AS DOUBLE)) * 3) / 10, 4) AS quality
              |FROM (SELECT doc_id, n_words,
              |             round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(n_words AS DOUBLE), 4) AS mean_wlen,
              |             round(CAST(hits_en AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS stop_ratio,
              |             round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
              |                   / CAST(length(text) AS DOUBLE), 6) AS alpha_ratio
              |      FROM ($hitsSql) h) q""".stripMargin)),

    // ── Token counting: whitespace vs BPE-ish regex tokens.
    QueryDef("q_text_tokens",
      (s, d) => TextAnalysis.tokenCounts(Tables.documents(s, d))
        .select(col("doc_id"), col("ws_tokens"), col("re_tokens"), col("n_chars")),
      Some("""SELECT doc_id,
             |       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^ ]')) AS BIGINT) AS re_tokens,
             |       n_chars
             |FROM documents""".stripMargin)),

    // ── 48-bit normalized-content fingerprint.
    QueryDef("q_text_fingerprint",
      (s, d) => TextAnalysis.fingerprint(Tables.documents(s, d))
        .select(col("doc_id"), col("fp48")),
      Some(s"""SELECT doc_id,
              |       ${PortableSql.hexToLong(
                "md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))")} AS fp48
              |FROM documents""".stripMargin)),

    // ── TF-IDF top-3 terms per doc (rational idf = N/df — no ln(), which
    //    is not FP-portable across engines; see TextAnalysis.tfidfTopK).
    QueryDef("q_tfidf_topk",
      (s, d) => TextAnalysis.tfidfTopK(
        Tables.documents(s, d).select(col("doc_id"), col("text")), 3),
      Some("""WITH tf AS (SELECT doc_id, wd AS word, count(*) AS tf
             |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
             |                  FROM documents) u
             |            WHERE wd <> '' GROUP BY 1, 2),
             |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM documents),
             |sc AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
             |              round(CAST(tf.tf * n.n AS DOUBLE) / CAST(df.df AS DOUBLE), 6) AS score
             |       FROM tf JOIN df USING (word) CROSS JOIN n),
             |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             |                                   ORDER BY score DESC, word ASC) AS rk
             |      FROM sc)
             |SELECT doc_id, rk, word, tf, df, score FROM r WHERE rk <= 3""".stripMargin)),

    // ── Collocations: top word pairs by document-level co-occurrence lift
    //    (log-free PMI — same ranking, FP-portable).
    QueryDef("q_cooc_lift",
      (s, d) => TextAnalysis.coocLift(
        Tables.documents(s, d).select(col("doc_id"), col("text")), 20),
      Some("""WITH w AS (SELECT DISTINCT doc_id, wd AS word
             |           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
             |                 FROM documents) u
             |           WHERE wd <> ''),
             |df AS (SELECT word, count(*) AS df FROM w GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM documents),
             |cooc AS (SELECT a.word AS word_a, b.word AS word_b, count(*) AS cooc
             |         FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.word < b.word
             |         GROUP BY 1, 2)
             |SELECT c.word_a, c.word_b, c.cooc,
             |       round(CAST(c.cooc * n.n AS DOUBLE) / CAST(da.df * db.df AS DOUBLE), 6) AS lift
             |FROM cooc c
             |JOIN df da ON da.word = c.word_a
             |JOIN df db ON db.word = c.word_b
             |CROSS JOIN n
             |ORDER BY lift DESC, word_a ASC, word_b ASC LIMIT 20""".stripMargin)),

    // ── Inverted index: word → df + head of the sorted posting list (the
    //    per-word payload cap real indexes use — see TextAnalysis).
    QueryDef("q_inverted_index",
      (s, d) => TextAnalysis.invertedIndex(
        Tables.documents(s, d).select(col("doc_id"), col("text")), 2),
      Some("""WITH w AS (SELECT DISTINCT doc_id, wd AS word
             |           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
             |                 FROM documents) u
             |           WHERE wd <> ''),
             |g AS (SELECT word, count(*) AS df,
             |             array_to_string(list_transform(
             |               (list(doc_id ORDER BY doc_id))[1:10],
             |               x -> CAST(x AS VARCHAR)), ',') AS postings_head
             |      FROM w GROUP BY word)
             |SELECT word, df, postings_head FROM g WHERE df BETWEEN 2 AND 1000000""".stripMargin)),

    // ── Intra-doc repetition ratio (Gopher-style quality rule), with
    //    deterministic repetition injected into every 9th doc.
    QueryDef("q_text_repetition",
      (s, d) => TextAnalysis.repetition(
        Tables.documents(s, d).select(col("doc_id"),
          when(col("doc_id") % 9 === 0,
            concat(col("text"), lit(" "), col("text"))).otherwise(col("text")).as("text"))),
      Some("""WITH aug AS (SELECT doc_id,
             |              CASE WHEN doc_id % 9 = 0 THEN concat(text, ' ', text)
             |                   ELSE text END AS text
             |             FROM documents),
             |sh AS (SELECT doc_id,
             |              unnest(list_transform(range(1, len(ws) - 1),
             |                     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
             |       FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM aug) w
             |       WHERE len(ws) >= 3),
             |g AS (SELECT doc_id, shingle, count(*) AS c FROM sh GROUP BY 1, 2),
             |r AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_grams,
             |             count(*) AS distinct_grams
             |      FROM g GROUP BY doc_id)
             |SELECT doc_id, total_grams, distinct_grams,
             |       round(CAST('1.0' AS DOUBLE)
             |             - CAST(distinct_grams AS DOUBLE) / CAST(total_grams AS DOUBLE), 6) AS rep_ratio
             |FROM r""".stripMargin)),

    // ── PII redaction: scrub injected phone/email patterns, report match
    //    counts + redacted text (patterns restricted to the Java-regex ∩
    //    RE2 common dialect so the oracle reproduces them).
    QueryDef("q_text_redact",
      (s, d) => TextAnalysis.redact(
        Tables.documents(s, d).select(col("doc_id"),
          concat(col("text"), lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" or u"), col("doc_id").cast("string"),
            lit("@example.com now")).as("text")))
        .select(col("doc_id"), col("n_phone"), col("n_email"), col("redacted")),
      Some(s"""WITH aug AS (SELECT doc_id,
              |              concat(text, ' call 555-',
              |                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
              |                     ' or u', CAST(doc_id AS VARCHAR),
              |                     '@example.com now') AS text
              |             FROM documents)
              |SELECT doc_id,
              |       CAST(len(regexp_extract_all(text, '${TextAnalysis.phonePattern}')) AS BIGINT) AS n_phone,
              |       CAST(len(regexp_extract_all(text, '${TextAnalysis.emailPattern}')) AS BIGINT) AS n_email,
              |       regexp_replace(regexp_replace(text, '${TextAnalysis.phonePattern}', '[PHONE]', 'g'),
              |                      '${TextAnalysis.emailPattern}', '[EMAIL]', 'g') AS redacted
              |FROM aug""".stripMargin)),

    // ── Partition-batched feature extraction over binary payloads: the
    //    mapPartitions seam a real embedding model runs in, with a
    //    deterministic byte-histogram featurizer so the path is
    //    oracle-checked end-to-end (UTF-8 payload bytes == char codes for
    //    this ASCII corpus, which the oracle exploits).
    QueryDef("q_multimodal_features",
      (s, d) => Multimodal.featurizePartitions(
        Multimodal.attachPayload(Tables.documents(s, d))),
      Some {
        val fs = (0 until 8).map(j =>
          s"CAST(len(list_filter(cs, x -> x % 8 = $j)) AS BIGINT) AS f$j").mkString(",\n       ")
        s"""SELECT doc_id,
           |       $fs
           |FROM (SELECT doc_id,
           |             list_transform(string_split_regex(text, ''), c -> ord(c)) AS cs
           |      FROM documents) t""".stripMargin
      }),

    // ── Multimodal metadata over opaque binary payloads (decode stubbed;
    //    plumbing real — see graft.ops.Multimodal).
    QueryDef("q_multimodal_meta",
      (s, d) => Multimodal.extractMeta(Multimodal.attachPayload(Tables.documents(s, d)))
        .select(col("doc_id"), col("meta.mime").as("mime"), col("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height")),
      Some("""SELECT doc_id, concat('bin/', source) AS mime,
             |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |       CAST(64 + (CAST(octet_length(encode(text)) AS BIGINT) * 7) % 192 AS INTEGER) AS width,
             |       CAST(64 + (CAST(octet_length(encode(text)) AS BIGINT) * 13) % 192 AS INTEGER) AS height
             |FROM documents""".stripMargin))
  )
}
