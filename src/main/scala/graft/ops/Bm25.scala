package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranking with a FIXED-POINT integer logarithm — the portable-log
  * design the TF-IDF operator's Scaladoc calls out as the blocker for
  * cross-engine BM25 (`ln()` differs in the last ulp between Java's
  * intrinsic and libm, which a hash-equality gate cannot tolerate).
  *
  * The log is log₂ in 1e-6 fixed point over an integer argument:
  *   log2e6(v) = msb(v)·10⁶ + T[(v·32 >> msb(v)) − 32]
  * where T is a 32-entry mantissa table (5-bit piecewise-constant, ≤ ~2%
  * relative error — ranking-grade, and EXACTLY reproducible anywhere
  * integers shift). BM25's idf uses the Lucene-style `ln(1 + …)` form so
  * the argument is always ≥ 1, scaled by 1024 into the integer domain
  * with pure integer ops (no doubles anywhere in the score path):
  *   v = 1024 + (1024·(2(N−df)+1)) div (2·df+1)        [= arg·1024]
  *   idf2e6 = log2e6(v) − 10·10⁶                        [log₂ units]
  * The tf saturation term with k1=1.2, b=0.75 clears denominators into a
  * single integer ratio (L = Σ dl over the corpus, dl = doc length):
  *   tf_part = 44·L·tf / (20·L·tf + 6·L + 18·dl·N)
  * so score_e6 = Σ_t (idf2e6(t)·44·L·tf) div (20·L·tf + 6·L + 18·dl·N).
  * Scores are in log₂ units (ln·1/ln2 — a positive constant factor, so
  * the RANKING is exactly BM25's). Integer domain: safe while
  * idf2e6·44·L·tf < 2⁶³, i.e. corpora to ~10¹⁰ total tokens; shard above.
  *
  * Scale shape: tf and df are the same partial-aggregable counts TF-IDF
  * uses; doc lengths join via the tf frame; N and L are two scalar
  * aggregates. Nothing about the fixed-point math adds a shuffle.
  */
object Bm25 {

  /** T[i] = round(log₂(1 + i/32)·10⁶), i ∈ [0, 31]. */
  val mantissaE6: IndexedSeq[Long] =
    (0 until 32).map(i => math.round(math.log1p(i / 32.0) / math.log(2.0) * 1e6))

  /** Pure-Scala twin of [[log2E6]] for computing LITERAL constants at
    * plan-build time (e.g. SPRT log-likelihood coefficients) — same msb
    * + 5-bit mantissa algorithm, so a constant embedded in both the
    * Spark plan and the SQL oracle is identical by construction. */
  def log2E6Int(v: Long): Long = {
    require(v >= 1, "log2E6Int needs a positive argument")
    val m = 63 - java.lang.Long.numberOfLeadingZeros(v)
    m * 1000000L + mantissaE6((((v * 32) >> m) - 32).toInt)
  }

  /** Highest set bit of a positive BIGINT (floor(log₂ v)) as a literal
    * comparison ladder — no log in sight. */
  def msb(v: Column): Column =
    // fold ascending so the HIGHEST bit's check ends up outermost
    (1 to 47).foldLeft(lit(0)) { (acc, b) =>
      when(v >= lit(1L << b), lit(b)).otherwise(acc)
    }

  /** SQL twin of [[msb]]. The argument is re-parenthesized before
    * textual substitution — `log2E6Sql("ca + 1")` once expanded to
    * `ca + 1 * 32` (the r8 q_log_odds_words bug); composite expressions
    * are now safe. */
  def msbSql(v0: String): String = {
    val v = s"($v0)"
    "(CASE " + (47 to 1 by -1).map(b => s"WHEN $v >= ${1L << b} THEN $b")
      .mkString(" ") + " ELSE 0 END)"
  }

  /** log₂(v)·10⁶ for positive integer v (exact msb + 5-bit mantissa). */
  def log2E6(v: Column): Column = {
    val m = msb(v)
    val idx = (BitOps.shiftRight(v * 32, m) - 32).cast("int")
    m.cast("long") * lit(1000000L) +
      element_at(array(mantissaE6.map(lit(_)): _*), idx + 1)
  }

  /** SQL twin of [[log2E6]] (DuckDB `>>` takes column amounts natively). */
  def log2E6Sql(v0: String): String = {
    val v = s"($v0)"
    val m = msbSql(v)
    val table = mantissaE6.mkString("[", ", ", "]")
    s"($m * 1000000 + $table[((($v * 32) >> $m) - 32) + 1])"
  }

  /** idf in e6 log₂ units from integer (N, df) column NAMES (string-based
    * because the ·1024 scaling uses SQL integer `div`) — all integer. */
  def idfE6(nCol: String, dfCol: String): Column = {
    val v = expr(s"1024 + (1024 * (2 * ($nCol - $dfCol) + 1)) div (2 * $dfCol + 1)")
    log2E6(v) - lit(10000000L)
  }

  /** Score every document of `docs(doc_id, text)` against `terms`,
    * returning the top `k` by integer BM25 score (ties → smaller doc_id).
    * Output: (doc_id, score_e6). */
  def topK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val n = docs.count()
    val tf = TextAnalysis.termFreq(docs)
      .filter(col("word").isin(terms: _*))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("bm_df"))
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val lRow = dl.agg(sum(col("dl"))).head()
    val l = if (lRow.isNullAt(0)) 0L else lRow.getLong(0) // empty corpus → no rows anyway
    tf.join(broadcast(df), "word").join(dl, "doc_id")
      .withColumn("bm_n", lit(n))
      .withColumn("idf_e6", idfE6("bm_n", "bm_df"))
      .withColumn("term_score",
        expr(s"(idf_e6 * 44 * $l * tf) div (20 * $l * tf + 6 * $l + 18 * dl * bm_n)"))
      .groupBy(col("doc_id")).agg(sum(col("term_score")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id").asc)
      .limit(k)
  }
}
