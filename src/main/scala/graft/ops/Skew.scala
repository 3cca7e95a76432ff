package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives. AQE's skew-join split handles most runtime
  * skew; explicit salting is the deterministic fallback when one key
  * dominates a shuffle (the classic 100 TB failure mode: one executor
  * owns the hot key's partition while 999 idle). */
object Skew {

  /** Salted equi-join: the big side fans its hot keys across `salts`
    * sub-keys; the small side replicates once per salt. Result is
    * identical to the plain join — only the shuffle distribution changes
    * (hot-key partition size drops by ~`salts`×). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 saltSrc: Column): DataFrame =
    big.withColumn("__salt", pmod(saltSrc, lit(salts)))
      .join(small.withColumn("__salt",
        explode(sequence(lit(0), lit(salts - 1)))), Seq(key, "__salt"))

  /** Skew diagnostic for a set of candidate shuffle keys: per key
    * column, row count, distinct keys, the hot key's count and e6 share,
    * and the integer salt factor that would level its partition down to
    * the mean (⌈top1·n_keys / n⌉ — 1 means "no salting needed"). This is
    * the measurement that decides between a plain shuffle, AQE skew
    * split, and [[saltedJoin]] BEFORE the job runs at scale. Ties on the
    * hot count break toward the larger key string (struct-max) for
    * determinism.
    *
    * One count aggregate per candidate column (map-side combinable)
    * feeding a tiny max_by/summary reduce; candidates are scanned in one
    * pass each. Output: (key_col, n_rows, n_keys, top1_cnt,
    * top1_share_e6, salt_factor). */
  def advisor(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one candidate key column")
    keyCols.map { kc =>
      df.select(col(kc).cast("string").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(struct(col("c"), col("k"))).as("top"))
        .select(lit(kc).as("key_col"), col("n_rows"), col("n_keys"),
          col("top.c").as("top1_cnt"))
        .withColumn("top1_share_e6", expr("top1_cnt * 1000000L div n_rows"))
        .withColumn("salt_factor",
          expr("(top1_cnt * n_keys + n_rows - 1L) div n_rows"))
    }.reduce(_ unionByName _)
  }
      .drop("__salt")
}
