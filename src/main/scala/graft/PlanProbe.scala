package graft

import org.apache.spark.sql.SparkSession

/** Local iteration helper: print the exchange/broadcast counts (the
  * PlanShapeSpec signature) and the formatted plan for the named queries.
  *
  * Usage: runMain graft.PlanProbe <sfDir> q_a,q_b [--full]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val full = args.contains("--full")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val qe = SparkEntry.queries(n)(spark, sfDir).queryExecution
      val p = qe.executedPlan.toString
      val ex = "Exchange (hash|range)partitioning".r.findAllIn(p).size
      val bc = "BroadcastExchange".r.findAllIn(p).size
      println(s"SHAPE $n exchanges=$ex broadcasts=$bc")
      if (full) println(qe.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
