package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, Window => LWindow}

/** The single-partition-window invariant, pinned as a gate (VERDICT r8
  * item 5): an unpartitioned `Window.orderBy` moves ALL rows to one
  * partition, which is safe ONLY when the window's input is a
  * pre-aggregated axis (daily counts, a brand rollup, a distinct value
  * spine — thousands of rows at any SF, bounded by the axis, not the
  * data volume). A refactor that hoists such a window ABOVE its
  * aggregate turns a bounded sort into an all-data single-partition
  * sort — correct results, catastrophic at 100 TB. This sweep walks the
  * optimized logical plan of EVERY registry query and fails if any
  * unpartitioned Window's input subtree lacks an Aggregate.
  *
  * Two structural notes:
  *  - `localCheckpoint` truncates the visible plan, so a window over a
  *    checkpointed frame is judged against the post-checkpoint subtree;
  *    checkpoints in this repo always materialize pre-reduced axes, so
  *    absence of an upstream Aggregate there is still a red flag — such
  *    sites go through the allowlist with a written rationale instead.
  *  - `distinct()` optimizes to Aggregate, so distinct value spines pass.
  */
class SinglePartitionWindowSpec extends SparkSpec {

  /** Sites where the unpartitioned window legitimately runs on an input
    * with no upstream Aggregate in the VISIBLE plan. Every entry needs a
    * bounded-axis rationale; additions to this list are design reviews,
    * not routine. */
  private val allowlisted: Map[String, String] = Map(
    "q_ks_test" -> ("window input is the localCheckpoint-materialized " +
      "distinct-value cell axis (ops/Stats.scala ks2) — post-aggregate, " +
      "truncated from the visible plan"),
    "q_mann_whitney" -> ("checkpointed distinct-value cell axis " +
      "(ops/Stats.scala mannWhitneyU) — post-aggregate behind the checkpoint"),
    "q_isotonic" -> ("checkpointed bucket axis (ops/Stats.scala " +
      "isotonicFit) — post-aggregate behind the checkpoint"),
    "q_decision_stump" -> ("checkpointed distinct-feature axis " +
      "(ops/Stats.scala decisionStump) — post-aggregate behind the checkpoint"),
    "q_seasonal_anomaly" -> ("checkpointed hourly-residual axis " +
      "(calendar-bounded) — post-aggregate behind the checkpoint"),
    "q_siegel_slope" -> ("checkpointed calendar-day axis; pairwise slopes " +
      "are day×day, bounded by the time range, not data volume"),
    "q_qq_map" -> ("checkpointed distinct-length cell axis (shared by " +
      "both quantile ladders) — post-aggregate behind the checkpoint"),
    "q_rank_fusion" -> ("window input is the literal doc_id < 200 slice " +
      "— 200 rows by construction at any scale"),
    "q_getis_ord" -> ("RANGE neighborhood window runs directly on the " +
      "localCheckpoint-materialized latitude-band axis (34 bands at any " +
      "SF — bounded by the grid, not data volume); the groupBy that " +
      "built it is truncated from the visible plan"),
    "q_kz_filter" -> ("second KZ pass re-windows the checkpointed " +
      "first-pass output — the calendar-day axis (bounded) with the " +
      "first pass's Aggregate truncated from the visible plan"),
    "q_abc_migration" -> ("both year legs rank the checkpointed " +
      "(part, year) revenue rollup — post-aggregate behind the " +
      "checkpoint; the same part axis q_abc_pareto sorts with its " +
      "Aggregate visible"),
    "q_cochrane_orcutt" -> ("residual/x/y lag windows run on the " +
      "checkpointed calendar-month rollup (bounded by the date range) — " +
      "same pattern and rationale as q_engle_granger below"),
    "q_engle_granger" -> ("residual lag window runs on the checkpointed " +
      "calendar-month revenue rollup (bounded by the date range, not " +
      "data volume) — ONE orders scan feeds OLS moments, residuals, " +
      "and the ADF lag; the Aggregate is truncated from the visible " +
      "plan by the checkpoint"),
    "q_sen_slope" -> ("median-rank window input is the self-join of the " +
      "checkpointed calendar-month axis — ≤ n_months² pairs, bounded by " +
      "the date range, not data volume; the month Aggregate is " +
      "truncated from the visible plan by the checkpoint"))

  test("unpartitioned windows only ever run on post-aggregate axes") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val bad = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!allowlisted.contains(name)) {
        try {
          val plan = fn(spark, sf()).queryExecution.optimizedPlan
          // Aggregate bounds the axis (grouped rollup / distinct spine);
          // Limit bounds it literally (top-k) — both make an
          // unpartitioned window safe at any scale.
          val naked = plan.collect {
            case w: LWindow if w.partitionSpec.isEmpty &&
              w.child.collectFirst {
                case _: Aggregate => (); case _: GlobalLimit => ()
                case _: LocalLimit => ()
              }.isEmpty => w
          }
          if (naked.nonEmpty)
            bad += s"$name (${naked.size} unpartitioned window(s) on non-aggregated input)"
        } catch {
          case e: Throwable => bad += s"$name (plan build failed: ${e.getMessage})"
        }
      }
    }
    assert(bad.isEmpty,
      "unpartitioned Window.orderBy over a non-aggregated input — a " +
        "single-partition sort over raw data at scale:\n  " +
        bad.mkString("\n  "))
  }
}
