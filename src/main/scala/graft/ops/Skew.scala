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
      .drop("__salt")
}
