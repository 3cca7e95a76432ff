package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the canonical co-located-join pattern at
  * 100 TB: both sides written `bucketBy(n, key)` + `sortBy(key)` agree
  * on Spark's bucket hash, so a later equi-join on the key (and any
  * aggregate keyed on it) reads pre-clustered buckets and plans ZERO
  * shuffle exchanges — the join cost drops from "reshuffle both sides
  * every query" to "pay one layout write, join free forever after".
  * This is what a fact table keyed by its hottest join key should look
  * like at rest; the one-time write is the amortized shuffle.
  *
  * Spark specifics that make this work (and that the spec pins):
  * `spark.sql.sources.bucketing.enabled` (default true), equal bucket
  * counts on both sides, the join key equal to the bucket column, and
  * a `sortBy` matching the join key so sort-merge join skips its sorts
  * too. The bucket layout lives in the session catalog (parquet +
  * bucket metadata in the table definition).
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted managed parquet table (overwrite).
    * Drops any prior table AND its warehouse directory first: the
    * default catalog is in-memory per JVM, so a location left by an
    * earlier process is orphaned metadata-less parquet that would fail
    * the create with LOCATION_ALREADY_EXISTS. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Equi-join of two ALREADY-BUCKETED tables on their shared bucket
    * key: with equal bucket counts this plans no exchange on either
    * side, and a downstream aggregate keyed on `key` rides the same
    * distribution (still zero exchanges). */
  def join(spark: SparkSession, left: String, right: String,
           key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
