package graft

import org.apache.spark.sql.SparkSession

/** Bench-only AQE / broadcast-threshold probe (SURVEY §7.4 roadmap item):
  * documents how the flagship multi-join query (`q_tpch_local_volume`,
  * the TPC-H Q5 shape) degrades when broadcast joins are disabled and
  * when AQE is off — the two knobs that decide its 100 TB plan. No
  * oracle: this is a plan/latency study, not a correctness query.
  *
  * Prints ONE JSON line: per config, seconds (median of 3 warm runs),
  * exchange count, and broadcast count from the executed plan.
  *
  * Measured at sf0.1 (2026-08-13): default 5 broadcasts / 1 exchange;
  * no_broadcast keeps 4 broadcasts — those are the query's EXPLICIT
  * broadcast() hints, which survive any threshold, and only the one
  * size-inferred join degrades to shuffle (1 → 3 exchanges). That is the
  * designed behaviour: dimension broadcasts in this engine are pinned by
  * hint, not left to threshold luck.
  */
object AqeProbe {
  private case class Cfg(name: String, sets: Seq[(String, String)])

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val query = "q_tpch_local_volume"
    val cfgs = Seq(
      Cfg("default", Seq(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "10485760")),
      Cfg("no_broadcast", Seq(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        // AQE re-promotes SMJ to broadcast at runtime via its own knob
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")),
      Cfg("no_aqe", Seq(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "10485760")))
    val results = cfgs.map { cfg =>
      cfg.sets.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = SparkEntry.queries(query)(spark, sfDir)
      df.count() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(query)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val plan = df.queryExecution.executedPlan.toString
      val ex = "Exchange (hash|range)partitioning".r.findAllIn(plan).size
      val bc = "BroadcastExchange".r.findAllIn(plan).size
      f"""\"${cfg.name}\":{\"sec\":${times(1)}%.3f,\"exchanges\":$ex,\"broadcasts\":$bc}"""
    }
    // restore defaults for any shared session
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    val line =
      s"""{"probe":"aqe","query":"$query","sf":"$sfDir",${results.mkString(",")}}"""
    spark.stop()
    println(line)
  }
}
