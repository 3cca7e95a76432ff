package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) join — entity resolution for dirty keys
  * (typo'd ids, OCR'd names). The naive form is a cross join with a
  * levenshtein filter: quadratic, never viable. Blocking fixes the scale:
  * both sides key on a cheap canopy (here: string prefix), candidates
  * only form inside a block, and the exact edit-distance filter runs on
  * that bounded set — the same candidate-pruning shape as MinHash-LSH and
  * simhash banding, applied to strings.
  *
  * Caveat the caller owns: a typo inside the prefix escapes the block
  * (standard blocking trade-off; use multiple passes with different
  * canopies — prefix, suffix, phonetic — to close recall gaps).
  */
object FuzzyJoin {

  /** Match `left.col(key)` to `right.col(key)` within `maxDist` edits,
    * blocking on the first `prefixLen` chars. Output: (left key, right
    * key, dist), deduplicated. */
  def byEditDistance(left: DataFrame, right: DataFrame, key: String,
                     maxDist: Int = 1, prefixLen: Int = 2): DataFrame = {
    val l = left.select(col(key).as("l_key"))
      .withColumn("blk", substring(col("l_key"), 1, prefixLen)).distinct()
    val r = right.select(col(key).as("r_key"))
      .withColumn("blk", substring(col("r_key"), 1, prefixLen)).distinct()
    l.join(r, "blk")
      // threshold variant: early-exits the DP once distance exceeds
      // maxDist (O(maxDist·len) per pair instead of O(len²)) and returns
      // -1 beyond it — same survivors, same distances ≤ maxDist
      .withColumn("dist", levenshtein(col("l_key"), col("r_key"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("l_key"), col("r_key"), col("dist"))
  }

  /** Consonant-skeleton phonetic canopy: first char + the remainder with
    * vowels removed — a dialect-portable soundex stand-in (pure
    * regexp_replace, identical under Java regex and RE2). Typos that
    * swap/drop a vowel still land in the same block. */
  def phoneticKey(c: Column): Column =
    concat(substring(c, 1, 1),
      regexp_replace(substring(c, 2, 1000000), "[aeiou]", ""))

  /** Multi-canopy blocked fuzzy join: candidates form inside ANY of three
    * cheap canopies — prefix, suffix, phonetic skeleton — then the exact
    * edit-distance filter runs once on the union. Closes the single-prefix
    * recall gap [[byEditDistance]] documents: a typo in the first chars
    * escapes the prefix block but is still caught by the suffix or
    * phonetic pass.
    *
    * Scale shape: each canopy is an equi-join on its block key (never a
    * cross join); the union dedups on (l_key, r_key) before the
    * levenshtein filter so the quadratic-cost distance runs once per
    * candidate pair regardless of how many canopies caught it. */
  def multiCanopy(left: DataFrame, right: DataFrame, key: String,
                  maxDist: Int = 1, affixLen: Int = 2): DataFrame = {
    val canopies: Seq[Column => Column] = Seq(
      c => substring(c, 1, affixLen),
      c => substring(c, -affixLen, affixLen),
      c => phoneticKey(c))
    val cands = canopies.map { blk =>
      val l = left.select(col(key).as("l_key"))
        .withColumn("blk", blk(col("l_key"))).distinct()
      val r = right.select(col(key).as("r_key"))
        .withColumn("blk", blk(col("r_key"))).distinct()
      l.join(r, "blk").select(col("l_key"), col("r_key"))
    }.reduce(_ unionByName _).distinct()
    cands
      .withColumn("dist", levenshtein(col("l_key"), col("r_key"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }

  /** Fellegi–Sunter match weights over BLOCKED candidate pairs: each
    * pair carries agreement bits f1/f2/f3 and a truth bit `is_match`;
    * per field the m-probability a_k/M (agreement among matches) and
    * u-probability b_k/U (agreement among non-matches) combine into the
    * classic log-likelihood weight — agreement contributes
    * log₂(m/u) = log₂(a_k·U) − log₂(b_k·M), disagreement
    * log₂((1−m)/(1−u)) — summed per PATTERN in e6 fixed point (counts
    * slot straight into the shared integer log₂; zero cells clamp to 1,
    * the standard add-one guard). Output one row per observed pattern:
    * (f1, f2, f3, n_pairs, n_match, weight_e6) — the decision table a
    * linkage pipeline thresholds.
    *
    * Scale: the caller owns blocking (candidate set, never a cross
    * join); this aggregate is one pattern-keyed count plus broadcast
    * scalar totals — 8 pattern rows.
    *
    * Codegen shape: the naive wide form inlines 12 [[Bm25.log2E6]] calls
    * (each carrying two 47-branch msb ladders) into ONE projection, which
    * blows Janino's 64 KB method limit and silently drops the whole stage
    * to interpreted eval. Instead the pattern table is reshaped LONG —
    * one row per (pattern, field) carrying just the two log arguments
    * that field contributes — so each generated projection holds exactly
    * two log2E6 trees, then a second ≤8-group aggregate sums the
    * per-field weights back per pattern. The extra exchange moves ≤24
    * rows at any corpus size. */
  def fellegiSunter(pairs: DataFrame): DataFrame = {
    val pat = pairs.groupBy(col("f1"), col("f2"), col("f3"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("is_match"), 1L).otherwise(0L)).as("n_match"))
      .localCheckpoint(false) // ≤ 8 pattern rows; ONE pair scan
    val fieldTotals = (1 to 3).map { k =>
      pat.agg(sum(when(col(s"f$k"), col("n_match")).otherwise(0L)).as("a"),
        sum(when(col(s"f$k"), col("n_pairs") - col("n_match")).otherwise(0L))
          .as("b"))
        .selectExpr(s"a AS a$k", s"b AS b$k")
    }
    val tot = pat.agg(sum(col("n_match")).as("m"),
      sum(col("n_pairs") - col("n_match")).as("u"))
    val joined = fieldTotals.foldLeft(pat.crossJoin(broadcast(tot))) {
      (acc, ft) => acc.crossJoin(broadcast(ft))
    }
    // Per field k: agreement contributes log₂(a_k·U) − log₂(b_k·M),
    // disagreement log₂((M−a_k)·U) − log₂((U−b_k)·M). Select the (x, y)
    // log-argument pair per field with cheap integer whens, explode to
    // long form, take logs once, sum back.
    def fieldArgs(k: Int): Column = struct(
      when(col(s"f$k"), greatest(col(s"a$k") * col("u"), lit(1L)))
        .otherwise(greatest((col("m") - col(s"a$k")) * col("u"), lit(1L)))
        .as("x"),
      when(col(s"f$k"), greatest(col(s"b$k") * col("m"), lit(1L)))
        .otherwise(greatest((col("u") - col(s"b$k")) * col("m"), lit(1L)))
        .as("y"))
    joined
      .select(col("f1"), col("f2"), col("f3"), col("n_pairs"),
        col("n_match"),
        explode(array(fieldArgs(1), fieldArgs(2), fieldArgs(3))).as("fa"))
      .select(col("f1"), col("f2"), col("f3"), col("n_pairs"),
        col("n_match"),
        (Bm25.log2E6(col("fa.x")) - Bm25.log2E6(col("fa.y"))).as("w"))
      .groupBy(col("f1"), col("f2"), col("f3"), col("n_pairs"),
        col("n_match"))
      .agg(sum(col("w")).as("weight_e6"))
  }
}
