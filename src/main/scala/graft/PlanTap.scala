package graft

import org.apache.spark.sql.DataFrame

/** Plan-evidence tap for checkpoint-truncated pipelines (r13, VERDICT
  * item 7): a `localCheckpoint` swaps the logical plan for a flat
  * LogicalRDD leaf, so the FINAL `.explain` of an iterative query opens
  * at `Scan ExistingRDD` and carries no evidence of the stages upstream
  * of the last checkpoint (the r12 q_msf/q_lof plan files). Operators
  * wrap the frame they are about to checkpoint in `PlanTap.tap(df,
  * label)`; when `SPARK_GRAFT_PLAN_TAP=1` the first occurrence of each
  * label prints the frame's formatted PRE-checkpoint plan between
  * `PLANTAP <label> BEGIN/END` markers (tools/r13_plans.sh splices them
  * into plans/r13/). Disabled — the default, including every bench and
  * verify path — the call is a no-op boolean check. */
object PlanTap {
  private val enabled = sys.env.get("SPARK_GRAFT_PLAN_TAP").contains("1")
  private val seen =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def tap(df: DataFrame, label: String): DataFrame = {
    if (enabled && seen.add(label)) {
      println(s"PLANTAP $label BEGIN")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println(s"PLANTAP $label END")
    }
    df
  }
}
