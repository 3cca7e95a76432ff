package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Local optimization-loop helper (guide §1): time the named queries
  * (min + median over N runs, after one untimed warm run) and count the
  * Spark jobs / stages / tasks each run schedules — the per-round
  * overhead signal the wall clock alone hides.
  *
  * Usage: runMain graft.TimeProbe <sfDir> q_a,q_b [reps]
  * Env: SPARK_GRAFT_CPUS (default 32) — same contract as Bench.
  *
  * Prints one line per query:
  *   TIME <name> min=<s> med=<s> jobs=<n> stages=<n> tasks=<n>
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // A/B session-config overrides: SPARK_GRAFT_CONF="k=v;k=v"
    val extra = sys.env.getOrElse("SPARK_GRAFT_CONF", "").split(";")
      .map(_.trim).filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1)) }
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })

    // Warm table loads once (parquet footers / page cache), like Bench.
    try Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    catch { case _: Throwable => () }

    if (sys.env.getOrElse("SPARK_GRAFT_INTERLEAVE", "0") == "1") {
      // Bench-like interleaved sweeps: pass p runs EVERY query once, so
      // cross-query cache effects (codegen class cache) show up in the
      // per-pass totals — pass 0 is cold, later passes are steady state.
      (0 until reps).foreach { p =>
        val t0 = System.nanoTime()
        names.foreach { n =>
          spark.sparkContext.setJobDescription(n)
          SparkEntry.queries(n)(spark, sfDir).count()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"PASS $p total=$secs%.3f n=${names.length}")
      }
    } else names.foreach { n =>
      val fn = SparkEntry.queries(n)
      spark.sparkContext.setJobDescription(n)
      // First (cold) run timed separately: planning + codegen + JIT
      // constants dominate the driver bench's cold-inclusive medians, so
      // the cold/warm split is the r13 probe signal.
      val c0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"COLD $n secs=${(System.nanoTime() - c0) / 1e9}%.3f")
      val ts = (1 to reps).map { _ =>
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // listener counters reflect the LAST rep (reset each rep)
      val sorted = ts.sorted
      println(f"TIME $n min=${sorted.head}%.3f med=${sorted(sorted.size / 2)}%.3f " +
        s"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
