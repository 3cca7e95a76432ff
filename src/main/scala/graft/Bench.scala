package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every registered query at SPARK_GRAFT_SF_DIR and
  * emits a machine-readable JSON summary.
  *
  * Output contract: the harness that invokes this captures only the LAST
  * ~2000 characters of stdout, so the final printed line must be a
  * complete, compact JSON document. With 75+ queries a full per-query dump
  * exceeds that budget, so:
  *   - the FULL per-query timing map is written to bench_full.json in the
  *     working directory (committed history lives in BASELINE.md), and
  *   - the last stdout line is a compact summary: total seconds, the
  *     slowest 20 queries (3 dp), error list, query count.
  * The compact line is printed after spark.stop() so no shutdown logging
  * can land between it and process exit. */
object Bench {
  private def fmt(v: Double): String = f"$v%.3f"

  /** Git HEAD sha of the working tree that produced this run, resolved by
    * reading .git directly (no subprocess). Makes every bench record
    * traceable to the exact code state — refreshed numbers in
    * bench_full.json/BASELINE.md carry their provenance. */
  private def gitHead(): String = {
    import java.nio.file.{Files, Paths}
    try {
      val head = new String(Files.readAllBytes(Paths.get(".git/HEAD"))).trim
      if (head.startsWith("ref: ")) {
        val ref = head.stripPrefix("ref: ")
        val refPath = Paths.get(".git", ref.split("/"): _*)
        if (Files.exists(refPath))
          new String(Files.readAllBytes(refPath)).trim.take(12)
        else {
          // packed refs fallback
          val packed = Paths.get(".git/packed-refs")
          if (Files.exists(packed)) {
            import scala.jdk.CollectionConverters._
            Files.readAllLines(packed).asScala
              .find(_.endsWith(" " + ref)).map(_.take(12)).getOrElse("unknown")
          } else "unknown"
        }
      } else head.take(12)
    } catch { case _: Throwable => "unknown" }
  }

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
    // SPARK_GRAFT_BENCH_REPEATS=N (default 3) runs N interleaved timed
    // passes over the whole query set and reports the per-query MEDIAN as
    // the headline number, with IQR spread in bench_full.json — so one
    // host-contention spike (the r4/r5 lesson: disjoint "slow" sets for
    // identical code) cannot poison a round-to-round comparison. Passes
    // interleave whole-set sweeps rather than repeating each query
    // back-to-back, so a transient contention window hits each query at
    // most once. Default is 3: the driver invokes Bench exactly once per
    // round, so the default itself must be the contention-immune median
    // (r6 lesson: a single contended pass recorded 255 s where every
    // committed run of the same code measured ~100 s).
    val repeats = sys.env.get("SPARK_GRAFT_BENCH_REPEATS")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(_ >= 1).getOrElse(3)
    val passes = (1 to repeats).map { _ =>
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    }
    def quantile(sorted: IndexedSeq[Double], q: Double): Double =
      sorted(math.min((q * (sorted.size - 1)).round.toInt, sorted.size - 1))
    // (name, median, iqr, ok-in-every-pass)
    val results = ordered.indices.map { i =>
      val name = ordered(i)._1
      val ts = passes.map(_(i)._2).sorted.toIndexedSeq
      (name, quantile(ts, 0.5), quantile(ts, 0.75) - quantile(ts, 0.25),
        passes.forall(_(i)._3))
    }
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val errs = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // Full per-query record → file (unbounded size; not parsed by the driver).
    val fullQs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val spreadJson =
      if (repeats > 1)
        "," + "\"spread\":" + results.map { case (k, med, iqr, _) =>
          s"\"" + k + "\":{\"med\":" + fmt(med) + ",\"iqr\":" + fmt(iqr) +
            s",\"n\":$repeats}"
        }.mkString("{", ",", "}")
      else ""
    // SPARK_GRAFT_CPUS may be non-numeric (e.g. "*" for local[*]) — emit it
    // as a JSON number only when it parses, else as a quoted string.
    val cpusJson = scala.util.Try(cpus.trim.toInt.toString)
      .getOrElse("\"" + cpus.replace("\"", "") + "\"")
    val meta =
      s""""commit":"${gitHead()}","ts_ms":${System.currentTimeMillis()},"cpus":$cpusJson,"repeats":$repeats,"spark":"${spark.version}","java":"${sys.props.getOrElse("java.version", "?")}""""
    val anyErr = results.exists(!_._4)
    val fullJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failed":$anyErr,"n_queries":${results.size},$meta,"queries":$fullQs$spreadJson,"errors":$errs,"sf":"$sfDir"}"""
    // Baseline protection (r7 lesson: a run with 120 fail-fast errors
    // overwrote the clean snapshot and its 162 s headline masqueraded as a
    // speedup). A run with ANY errored query is never a baseline: it goes
    // to bench_full_failed.json; bench_full.json only ever holds error-free
    // snapshots.
    try {
      val w = new java.io.PrintWriter(
        if (anyErr) "bench_full_failed.json" else "bench_full.json")
      try w.println(fullJson) finally w.close()
    } catch { case _: Throwable => () }
    println(fullJson)
    // Compact summary → stdout LAST (driver-parsed; must fit a 2000-char tail).
    val slowest = results.sortBy(-_._2).take(20)
      .map { case (k, v, _, _) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failed":$anyErr,"n_queries":${results.size},$meta,"queries":$slowest,"errors":$errs,"sf":"$sfDir"}"""
    spark.stop()
    println(compact)
    // A round whose bench has ANY errored query is a broken round, not a
    // slow one — exit nonzero so no harness can record it as a success.
    if (anyErr) sys.exit(2)
  }
}
