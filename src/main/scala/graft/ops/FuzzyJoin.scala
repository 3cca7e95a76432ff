package graft.ops

import org.apache.spark.sql.DataFrame
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
      .withColumn("dist", levenshtein(col("l_key"), col("r_key")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("l_key"), col("r_key"), col("dist"))
  }
}
