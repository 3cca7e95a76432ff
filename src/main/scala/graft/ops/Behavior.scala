package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral / event-sequence analytics: funnel progression, transition
  * (Markov) matrices, and frequent paths. The reference's event stream
  * (`mbta_to_kafka.py` positions keyed by vehicle) is exactly this shape —
  * a keyed, time-ordered sequence — and these are the standard questions a
  * telemetry engine answers over it.
  *
  * Scale design: every operator here is ONE shuffle on the entity key.
  * The funnel in particular avoids the naive step-cascade (one join per
  * funnel step → k shuffles): the whole per-entity sequence folds through
  * a state machine inside a single codegen'd higher-order `aggregate`
  * expression, so adding funnel steps adds zero shuffles.
  */
object Behavior {

  /** Highest funnel stage each entity reaches (0 = none), where stage k
    * requires an event of `steps(k-1)` STRICTLY after the event that
    * reached stage k-1 (greedy earliest progression — equivalent to the
    * stepwise `min ts > prev` definition because the fold scans in time
    * order). Events are sorted by (ts, type) per entity; ties cannot
    * regress the state machine because a non-matching event leaves the
    * accumulator unchanged.
    *
    * One shuffle (groupBy entity); the fold is O(events per entity) with
    * constant state — no join cascade, no window functions.
    */
  def funnelStages(events: DataFrame, entityCol: String, tsMicrosCol: String,
                   typeCol: String, steps: Seq[String],
                   maxStepGapUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty && steps.forall(_.matches("[A-Za-z0-9_]+")),
      "funnel steps must be simple identifiers")
    require(maxStepGapUs.forall(_ > 0), "maxStepGapUs must be positive")
    val cases = steps.zipWithIndex.map { case (st, i) =>
      // optional step deadline: stage k (k ≥ 2) must land within the gap
      // of stage k-1's reach time — one more guard, same one-shuffle plan.
      // Greedy-earliest stays ≡ stepwise-min: the gap only truncates each
      // stage's candidate set from above, and the fold still takes its
      // minimum.
      val gap = maxStepGapUs.filter(_ => i > 0)
        .map(g => s" AND x.t - acc.t <= ${g}L").getOrElse("")
      s"WHEN acc.stage = $i AND x.et = '$st' AND x.t > acc.t$gap THEN named_struct('stage', ${i + 1}, 't', x.t)"
    }.mkString(" ")
    events
      .select(col(entityCol).as("entity"), col(tsMicrosCol).as("t"),
        col(typeCol).as("et"))
      .groupBy(col("entity"))
      .agg(sort_array(collect_list(struct(col("t"), col("et")))).as("seq"))
      .withColumn("stage", expr(
        s"""aggregate(seq, named_struct('stage', 0, 't', CAST(-1 AS BIGINT)),
           |          (acc, x) -> CASE $cases ELSE acc END).stage""".stripMargin))
      .select(col("entity"), col("stage"))
  }

  /** Per-entity first-reach time of every funnel stage (null once the
    * funnel stalls): the same one-shuffle sorted fold as [[funnelStages]],
    * but the accumulator carries the full vector of stage times t1..tk,
    * so conversion lags (t2−t1, …) fall out as projections. Stage i+1
    * requires an event of `steps(i)` strictly after t_i; because stages
    * fill strictly in order, at most one CASE branch can fire per event. */
  def funnelTimes(events: DataFrame, entityCol: String, tsMicrosCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.forall(_.matches("[A-Za-z0-9_]+")),
      "funnel steps must be simple identifiers")
    val n = steps.size
    def stateOf(times: Seq[String]) =
      times.zipWithIndex.map { case (t, i) => s"'t${i + 1}', $t" }
        .mkString("named_struct(", ", ", ")")
    val init = stateOf(Seq.fill(n)("CAST(NULL AS BIGINT)"))
    val cases = steps.zipWithIndex.map { case (st, i) =>
      val guard = if (i == 0) "acc.t1 IS NULL"
        else s"acc.t${i + 1} IS NULL AND acc.t$i IS NOT NULL AND x.t > acc.t$i"
      val next = stateOf((1 to n).map(j => if (j == i + 1) "x.t" else s"acc.t$j"))
      s"WHEN $guard AND x.et = '$st' THEN $next"
    }.mkString(" ")
    events
      .select(col(entityCol).as("entity"), col(tsMicrosCol).as("t"),
        col(typeCol).as("et"))
      .groupBy(col("entity"))
      .agg(sort_array(collect_list(struct(col("t"), col("et")))).as("seq"))
      .withColumn("times", expr(
        s"aggregate(seq, $init, (acc, x) -> CASE $cases ELSE acc END)"))
      .select(col("entity") +: (1 to n).map(i => col(s"times.t$i").as(s"t$i")): _*)
  }

  /** First-order transition counts src→dst over each entity's time-ordered
    * event stream, with an integer transition probability in e6 units
    * (`cnt * 1e6 div Σ_src cnt` — all-integer, so cross-engine exact).
    * One shuffle for the per-entity ordering window, one for the pair
    * aggregate; the final per-src normalization window runs over the
    * already-tiny (src, dst) table. */
  def transitions(events: DataFrame, entityCol: String, tsCol: String,
                  typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol))
    events
      .withColumn("dst", lead(col(typeCol), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col(typeCol).as("src"), col("dst"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prob_e6", expr(
        "cnt * 1000000 div sum(cnt) OVER (PARTITION BY src)"))
  }

  /** Top-k most frequent length-3 event-type paths (consecutive per
    * entity). Same single ordering shuffle as [[transitions]]; the path
    * space is tiny (|types|³) so the final top-k is a broadcastable
    * aggregate. Ties break on path text for determinism. */
  def topPaths(events: DataFrame, entityCol: String, tsCol: String,
               typeCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol))
    events
      .withColumn("e2", lead(col(typeCol), 1).over(w))
      .withColumn("e3", lead(col(typeCol), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col(typeCol), col("e2"), col("e3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(k)
  }
}
