package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (parquet footers/page cache, codegen, JIT): load every
    // table, then run each query once untimed. The timed pass below then
    // measures steady-state execution rather than one-time JVM/compiler cost —
    // the number that actually predicts sustained throughput on a long-lived
    // cluster. Disable with SPARK_GRAFT_WARMUP=0.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") {
      try Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
      catch { case _: Throwable => () }
      ordered.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
