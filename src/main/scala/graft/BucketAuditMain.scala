package graft

import org.apache.spark.sql.SparkSession

/** Registry-wide bucketed-layout adoption audit (SURVEY §7.4m): prints
  * the recommendation table — which base tables, bucketed on which
  * keys, would take how many registry join sides exchange-free.
  *
  * Usage: runMain graft.BucketAuditMain <sfDir> [q_a,q_b]
  * (no names = the full registry; plan-only, nothing executes).
  */
object BucketAuditMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names =
      if (args.length > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Registry.all.map(_.name)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Audit the CLUSTER-scale join shape: at sf0.01 nearly every join
      // broadcasts and the audit sees zero shuffled joins (observed r10
      // — an empty table). At 100 TB the fact sides exceed any broadcast
      // threshold, so the sort-merge shape is the one bucketing must be
      // judged against (same probe convention as BucketedJoinSpec). Dims
      // that would still broadcast at scale show up as over-counted
      // rows; the per-table totals still rank the hot keys correctly.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ok = names.filter { n => // skip queries whose build needs a warehouse table
      try { SparkEntry.queries(n)(spark, sfDir); true }
      catch { case _: Throwable => false }
    }
    ops.BucketAudit.audit(spark, ok, n => SparkEntry.queries(n)(spark, sfDir))
      .orderBy(org.apache.spark.sql.functions.desc("n_join_sides"))
      .show(100, truncate = false)
    spark.stop()
  }
}
