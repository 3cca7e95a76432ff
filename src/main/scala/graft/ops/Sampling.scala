package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Spark's
  * `df.sample()` draws from a per-partition RNG — results change with
  * partitioning, retries, and engine version, which poisons reproducible
  * dataset builds. Hash-based sampling decides per RECORD from a portable
  * content hash ([[Dedup.hash48]]): the same row is kept everywhere, every
  * run, in any engine — and the decision is auditable from SQL.
  *
  * Scale: the predicate is a per-row expression (codegen'd, no shuffle,
  * pushes below wide transforms); a stratified rate map is just a CASE
  * over the stratum column.
  */
object Sampling {

  /** True iff `key` falls in the `pct`-percent keep bucket (0–100).
    * `pct` may be per-row (e.g. a CASE over a stratum column). */
  def keepHash(key: Column, salt: String, pct: Column): Column =
    pmod(Dedup.hash48(key, lit(salt)), lit(100)) < pct

  /** Stratified Bernoulli sample: keep `pct`% per row (rate typically a
    * CASE over the stratum column), keyed and salted for reproducibility. */
  def stratified(df: DataFrame, key: Column, salt: String, pct: Column): DataFrame =
    df.filter(keepHash(key, salt, pct))

  /** Deterministic weight-biased bottom-k sample: each row draws priority
    * hash48(id) div max(w, 1) — heavier rows draw stochastically smaller
    * priorities, so the bottom k is a reproducible weight-biased sample
    * (the integer-exact stand-in for A-ES exponential jumps, whose ln()
    * is not bit-portable across engines). Ties break on id; selection is
    * per-partition top-k + merge (TakeOrderedAndProject), never a global
    * sort. Output: (id, w, pri) — the k selected rows. */
  def weightedPriority(df: DataFrame, idCol: String, wCol: String,
                       salt: String, k: Int): DataFrame =
    df.select(col(idCol), col(wCol).cast("long").as(wCol))
      .withColumn("h", Dedup.hash48(col(idCol).cast("string"), lit(salt)))
      .withColumn("pri", expr(s"h div greatest($wCol, 1L)"))
      .orderBy(col("pri"), col(idCol)).limit(k)
      .select(col(idCol), col(wCol), col("pri"))

  /** Temperature-rebalanced mixture targets (α = 0.5): per class, the
    * target row count when sampling the corpus so class shares follow
    * n_k^α / Σ n^α instead of raw counts — the standard training-mix
    * flattening that up-weights small sources without letting them
    * dominate. α is fixed at 1/2 because n^½ = isqrt(n) is EXACT in
    * integers: floor(sqrt(·)) of an IEEE double is the true integer
    * square root for n < 2⁵², so both engines agree bit-for-bit with no
    * FP-order dependence (arbitrary α would need a portable fixed-point
    * pow).
    *
    * Output per class: n, weight = isqrt(n), target = N·w div Σw, and
    * p_e6 — the per-row e6 keep probability (capped at 1e6) that a
    * hash-gate sampler ([[keepHash]]) would apply downstream. One keyed
    * aggregate + a broadcast of the two scalar totals; class cardinality
    * is tiny by construction, so every post-aggregate step is
    * broadcast-sized. */
  def temperatureTargets(df: DataFrame, classCol: String): DataFrame = {
    val c = df.groupBy(col(classCol)).agg(count(lit(1)).as("n"))
      .withColumn("weight", expr("CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)"))
    val tot = c.agg(sum(col("n")).as("nn"), sum(col("weight")).as("sw"))
    c.crossJoin(broadcast(tot))
      .select(col(classCol), col("n"), col("weight"),
        expr("nn * weight div sw").as("target"),
        expr("least(1000000L, (nn * weight div sw) * 1000000L div n)").as("p_e6"))
  }
}
