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
}
