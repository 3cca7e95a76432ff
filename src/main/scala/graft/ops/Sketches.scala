package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — fixed-size frequency estimation for heavy-hitter
  * mining over unbounded key cardinality. The counter table is d rows ×
  * w buckets of BIGINTs (d·w counters TOTAL, independent of how many
  * distinct keys stream through), each bucket a partial-aggregable sum —
  * so the sketch build is one map-side-combining aggregate whose shuffle
  * is bounded by d·w rows, not by the key cardinality. Estimates are
  * `min_j counters[j][h_j(x)]`: always ≥ the true count (collisions only
  * inflate), within εN with probability 1−δ for w=⌈e/ε⌉, d=⌈ln(1/δ)⌉.
  *
  * Like [[graft.functions.KmvDistinct]], the hash is the portable md5
  * prefix ([[Dedup.hash48]]) and every counter is an integer — the sketch
  * CONTENTS reproduce bit-for-bit in any ANSI engine, so estimates are
  * oracle-checkable (no FP, no ln()).
  */
object Sketches {

  /** Bucket column for sketch row `j`. */
  def cmsBucket(item: Column, j: Int, w: Int): Column =
    Dedup.hash48(item, lit(s"cms$j")) % w

  /** Build the d×w counter table from `df(itemCol)`: one row per
    * (sketch row j, bucket, counter). */
  def cmsBuild(df: DataFrame, itemCol: String, d: Int = 3, w: Int = 64): DataFrame =
    (0 until d).map { j =>
      df.select(lit(j).as("j"), cmsBucket(col(itemCol).cast("string"), j, w).as("bucket"))
    }.reduce(_ unionByName _)
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("c"))

  /** Estimate counts for the distinct keys of `items(itemCol)` against a
    * [[cmsBuild]] counter table: join each key's d buckets, take the min.
    * The counters frame is tiny (d·w rows) — broadcast it. */
  def cmsEstimate(items: DataFrame, counters: DataFrame, itemCol: String,
                  d: Int = 3, w: Int = 64): DataFrame = {
    val keyed = (0 until d).map { j =>
      items.select(col(itemCol),
        lit(j).as("j"), cmsBucket(col(itemCol).cast("string"), j, w).as("bucket"))
    }.reduce(_ unionByName _)
    keyed.join(broadcast(counters), Seq("j", "bucket"))
      .groupBy(col(itemCol)).agg(min(col("c")).as("cms_est"))
  }
}
