package graft
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.mutable

/** Benchmark main. Runs every registered query at SPARK_GRAFT_SF_DIR and
  * emits a machine-readable JSON summary.
  *
  * Output contract: the harness that invokes this captures only the LAST
  * ~2000 characters of combined output, and may KILL the process at an
  * undisclosed wall-clock cap (r10 lesson: rc=124 with repeats=3 over 709
  * queries left NO artifact at all). Three defenses, in order:
  *
  *   1. Budget-aware pacing. `SPARK_GRAFT_BENCH_BUDGET_SECS` (default
  *      1800) is a wall-clock budget measured from main() entry. BEFORE
  *      warming, the runner projects (one warmup sweep + one timed pass)
  *      against the budget using a per-query cold estimate
  *      (`SPARK_GRAFT_EST_SECS_PER_QUERY`, default 1.7 — the committed
  *      registry-wide cold mean): when the projection does not fit, the
  *      per-query warmup is SKIPPED entirely (table-load warming only)
  *      so the budget buys one FULL cold timed pass instead of a warmed
  *      partial one (the r11 lesson: 661/735 with `partial:true`).
  *      When warming does run it additionally aborts at 35% budget
  *      spend, and after each timed pass the runner only starts another
  *      pass if the projection (elapsed + 1.15 x last pass) still fits.
  *      Repeats therefore degrade 3 -> 2 -> 1 automatically as the
  *      registry grows instead of blowing through the cap.
  *   2. Incremental evidence. Every completed (query, pass) sample is
  *      appended + flushed to bench_progress.jsonl immediately, so even a
  *      SIGKILL leaves a per-query record on disk.
  *   3. Shutdown-hook summary. SIGTERM (what `timeout` sends) runs JVM
  *      shutdown hooks: ours silences all logging (so no WARN spam can
  *      land after the JSON in the tail capture), writes the partial
  *      per-query medians to bench_full_failed.json, and prints the same
  *      compact summary line the normal path prints, flagged
  *      "partial":true — a killed run now still yields a parseable number
  *      for whatever completed.
  *
  * WindowExec/CacheManager WARN categories are forced to ERROR for the
  * whole run: the r10 tail capture was 100% WindowExec single-partition
  * warnings (all from the 14 allowlisted bounded-axis queries gated in
  * SinglePartitionWindowSpec), which crowded out the summary line.
  *
  * The FULL per-query timing map goes to bench_full.json (error-free
  * complete runs only; errored or partial runs go to
  * bench_full_failed.json so a broken run can never masquerade as a
  * baseline — the r7 lesson). The compact line prints after spark.stop()
  * on the normal path so no shutdown logging lands between it and exit. */
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

  /** Force noisy-at-scale log categories down so the 2000-char tail
    * capture holds the summary JSON, not WARN spam. Uses log4j2's
    * Configurator (the logging backend shipped in /opt/spark/jars). */
  private def silenceNoisyCategories(): Unit = {
    try {
      import org.apache.logging.log4j.Level
      import org.apache.logging.log4j.core.config.Configurator
      Seq(
        "org.apache.spark.sql.execution.window.WindowExec",
        "org.apache.spark.sql.execution.CacheManager",
        "org.apache.spark.sql.execution.datasources.SharedInMemoryCache",
        "org.apache.spark.scheduler.TaskSetManager"
      ).foreach(Configurator.setLevel(_, Level.ERROR))
    } catch { case _: Throwable => () }
  }

  /** Root logger -> OFF. Called from the shutdown hook so Spark's own
    * shutdown hooks (which run concurrently with ours) cannot append log
    * lines after our summary JSON in the tail capture. */
  private def silenceAllLogging(): Unit = {
    try {
      import org.apache.logging.log4j.Level
      import org.apache.logging.log4j.core.config.Configurator
      Configurator.setRootLevel(Level.OFF)
    } catch { case _: Throwable => () }
  }

  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    val budget = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_SECS")
      .flatMap(s => scala.util.Try(s.trim.toDouble).toOption)
      .filter(_ > 0).getOrElse(1800.0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Whole-stage-codegen class cache (STATIC conf, default 100 entries).
    // A registry-wide sweep compiles ~5 codegen units per query x 794
    // queries, so at the default size every interleaved pass evicts and
    // RECOMPILES the entire registry — the bench then measures Janino
    // compile time, not steady-state throughput (guide §1: a long-lived
    // cluster serving a repeated query mix keeps its generated classes).
    // Sized to hold one registry sweep; parameterised for other mixes.
    val codegenCache = sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", codegenCache)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    silenceNoisyCategories()

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // SPARK_GRAFT_BENCH_REPEATS=N (default 3) is the MAX number of
    // interleaved timed passes; the budget check below may stop earlier.
    // Per-query MEDIAN over completed passes is the headline (the r4/r5
    // contention lesson); passes interleave whole-set sweeps so a
    // transient contention window hits each query at most once.
    val maxRepeats = sys.env.get("SPARK_GRAFT_BENCH_REPEATS")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(_ >= 1).getOrElse(3)

    // ---- shared mutable state, visible to the shutdown hook ----
    // All reads/writes go through `stateLock`: the hook fires on SIGTERM
    // while the main thread may be mid-append, and an unguarded
    // iteration over a HashMap being rehashed would swallow the partial
    // summary the hook exists to emit.
    val stateLock = new Object
    val samples = mutable.LinkedHashMap[String, mutable.ArrayBuffer[Double]]()
    ordered.foreach { case (n, _) => samples(n) = mutable.ArrayBuffer.empty }
    // Warmup (cold-cache) durations: used by render() ONLY for queries
    // that have no timed sample yet — maximizes evidence if the harness
    // kills the run mid-pass-1.
    val warmSamples = mutable.HashMap[String, Double]()
    val failed = mutable.LinkedHashSet[String]()
    val finishedNormally = new AtomicBoolean(false)
    val completedPasses = new java.util.concurrent.atomic.AtomicInteger(0)

    // Linear-interpolation quantile (R type-7). The previous
    // nearest-rank-by-round() form returned the LARGER of two samples at
    // q=0.5 (round(0.5) = 1), so a 2-pass run — exactly what a tight
    // budget produces: one cold pass + one warm pass — reported every
    // query's COLD time as its "median" (the r12 driver artifact: value
    // 917.5 ≈ the cold-pass sum, while elapsed 1475 = cold 900 + warm
    // 540). True median of two samples is their mean; for odd n this is
    // byte-identical to the old formula. Measurement-bug fix disclosed in
    // OPTIMIZATION_r13.md (with the old-formula numbers kept alongside).
    def quantile(sorted: IndexedSeq[Double], q: Double): Double = {
      val pos = q * (sorted.size - 1)
      val lo = math.floor(pos).toInt
      val hi = math.min(lo + 1, sorted.size - 1)
      sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
    }

    val meta = {
      val cpusJson = scala.util.Try(cpus.trim.toInt.toString)
        .getOrElse("\"" + cpus.replace("\"", "") + "\"")
      s""""commit":"${gitHead()}","ts_ms":${System.currentTimeMillis()},"cpus":$cpusJson,"spark":"${spark.version}","java":"${sys.props.getOrElse("java.version", "?")}""""
    }

    /** Build (fullJson, compactJson) from whatever samples exist now.
      * Holds `stateLock` for the whole render so a concurrent append
      * (main thread vs shutdown hook) can never corrupt the snapshot. */
    def render(partial: Boolean): (String, String) = stateLock.synchronized {
      val results = samples.toSeq.flatMap {
        case (name, ts) if ts.nonEmpty =>
          val s = ts.sorted.toIndexedSeq
          Some((name, quantile(s, 0.5), quantile(s, 0.75) - quantile(s, 0.25),
            !failed.contains(name), ts.size))
        case (name, _) =>
          // no timed sample — cold warmup duration is better than nothing
          warmSamples.get(name).map(w =>
            (name, w, 0.0, !failed.contains(name), 0))
      }
      val total = results.map(_._2).sum
      val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val anyErr = failed.nonEmpty
      val fullQs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val spreadJson =
        "," + "\"spread\":" + results.map { case (k, med, iqr, _, n) =>
          "\"" + k + "\":{\"med\":" + fmt(med) + ",\"iqr\":" + fmt(iqr) +
            s",\"n\":$n}"
        }.mkString("{", ",", "}")
      val common =
        s""""failed":$anyErr,"partial":$partial,"n_queries":${results.size},"n_registry":${ordered.size},"passes":${completedPasses.get()},$meta,"budget_secs":${fmt(budget)},"elapsed_secs":${fmt(elapsed)}"""
      val full =
        s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$common,"queries":$fullQs$spreadJson,"errors":$errs,"sf":"$sfDir"}"""
      // Compact line sizing: the harness that invokes the bench captures
      // only the LAST ~2000 characters of output (measured exactly 2000 in
      // the round-12 BENCH artifact), and ~74 of those go to sbt's final
      // "[success] Total time" line. A fixed top-20 made round-over-round
      // PERF nearly blind (only 3 comparable queries at r12), but the FULL
      // 794-entry map (~20 KB) would push its own opening brace out of the
      // window and leave the driver nothing parseable. So: include as many
      // of the slowest queries as fit under a byte cap (default 1850,
      // env-overridable), slowest first — strictly a superset of the old
      // top-20, same shape, same fields. Full map still in bench_full.json.
      val compactCap = sys.env.get("SPARK_GRAFT_COMPACT_BYTES")
        .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
        .filter(_ > 0).getOrElse(1850)
      val compactPrefix =
        s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$common,"queries":{"""
      val compactSuffix = s"""},"errors":$errs,"sf":"$sfDir"}"""
      val slowEntries = results.sortBy(-_._2)
        .map { case (k, v, _, _, _) => "\"" + k + "\":" + fmt(v) }
      val budget0 = compactCap - compactPrefix.length - compactSuffix.length
      val kept = mutable.ArrayBuffer[String]()
      var used = 0
      var ei = 0
      while (ei < slowEntries.size &&
             used + slowEntries(ei).length + (if (ei == 0) 0 else 1) <= budget0) {
        used += slowEntries(ei).length + (if (ei == 0) 0 else 1)
        kept += slowEntries(ei)
        ei += 1
      }
      val compact = compactPrefix + kept.mkString(",") + compactSuffix
      (full, compact)
    }

    def writeFile(path: String, body: String): Unit =
      try {
        val w = new java.io.PrintWriter(path)
        try w.println(body) finally w.close()
      } catch { case _: Throwable => () }

    // Shutdown hook: a killed run still emits evidence. Does NOT touch
    // spark (Spark's own hooks race with this one); pure in-memory render.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!finishedNormally.get()) {
        silenceAllLogging()
        val (full, compact) = render(partial = true)
        writeFile("bench_full_failed.json", full)
        println(compact)
        System.out.flush()
      }
    }, "graft-bench-partial-summary"))

    val progress = new java.io.PrintWriter(
      new java.io.FileWriter("bench_progress.jsonl", false))
    def record(name: String, pass: Int, secs: Double, ok: Boolean): Unit = {
      try {
        progress.println(
          s"""{"q":"$name","pass":$pass,"secs":${fmt(secs)},"ok":$ok}""")
        progress.flush()
      } catch { case _: Throwable => () }
    }

    // Warm the session (parquet footers/page cache, codegen, JIT): load
    // every table, then run each query once untimed — the timed passes
    // then measure steady-state throughput, the number that predicts a
    // long-lived cluster. Two budget guards:
    //   (a) UP-FRONT projection (the r11 fix): a warmup sweep costs about
    //       one cold pass, so if (2 x estimated cold pass) doesn't fit
    //       the budget, skip per-query warming entirely — one FULL cold
    //       timed pass beats a warmed partial one (r11: 661/735,
    //       partial:true, because warmup ate 35% of an 1800 s budget
    //       that a ~1250 s cold pass would have fit).
    //   (b) while warming, stop once 35% of the budget is spent.
    // SPARK_GRAFT_WARMUP=0 disables entirely.
    val estPerQuery = sys.env.get("SPARK_GRAFT_EST_SECS_PER_QUERY")
      .flatMap(s => scala.util.Try(s.trim.toDouble).toOption)
      .filter(_ > 0).getOrElse(1.7)
    val estColdPass = ordered.size * estPerQuery
    val warmupFits = 2.0 * estColdPass <= 0.95 * budget
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") {
      // Table-load warming is always cheap enough (parquet footers +
      // page cache) and helps every query; run it regardless.
      try Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
      catch { case _: Throwable => () }
      if (warmupFits) {
        val warmCap = 0.35 * budget
        var i = 0
        while (i < ordered.size && elapsed < warmCap) {
          val w0 = System.nanoTime()
          try ordered(i)._2(spark, sfDir).count()
          catch { case _: Throwable => () }
          val w = (System.nanoTime() - w0) / 1e9
          stateLock.synchronized { warmSamples(ordered(i)._1) = w }
          i += 1
        }
      } else {
        System.err.println(
          f"[graft.Bench] skipping per-query warmup: 2 x est cold pass " +
            f"(${2 * estColdPass}%.0f s at ${ordered.size} queries x " +
            f"$estPerQuery%.2f s) exceeds 95%% of budget ($budget%.0f s)")
      }
    }

    // Timed interleaved passes, budget-gated between passes (and, as a
    // backstop, mid-pass at 97% spend — a partial pass still contributes
    // per-query samples to the median of whatever it covered).
    var pass = 0
    var lastPassSecs = 0.0
    var continuePasses = true
    while (continuePasses && pass < maxRepeats) {
      val passStart = elapsed
      var i = 0
      var aborted = false
      while (i < ordered.size && !aborted) {
        val (name, fn) = ordered(i)
        val q0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val secs = (System.nanoTime() - q0) / 1e9
        stateLock.synchronized {
          samples(name) += secs
          if (!ok) failed += name
        }
        record(name, pass, secs, ok)
        if (elapsed > 0.97 * budget) aborted = true
        i += 1
      }
      lastPassSecs = elapsed - passStart
      if (!aborted) completedPasses.incrementAndGet()
      pass += 1
      // Start another pass whenever meaningful budget remains (r13): the
      // 97% mid-pass abort above already bounds the overrun, and a PARTIAL
      // extra pass still appends a per-query sample for everything it
      // covers — at 2 completed passes the median is cold-inclusive, so a
      // third (even partial) pass flips covered queries to their true
      // steady-state median. The old gate (start only if a FULL pass
      // projects to fit) threw that remaining budget away: the r12 driver
      // run stopped at 1475 s of an 1800 s budget. Runs whose budget fits
      // all `maxRepeats` full passes behave exactly as before.
      continuePasses = !aborted && elapsed < 0.90 * budget
    }
    progress.close()

    val complete = completedPasses.get() >= 1 &&
      samples.values.forall(_.nonEmpty)
    val (fullJson, compactJson) = render(partial = !complete)
    // Baseline protection (r7 lesson): a run with ANY errored query — or
    // an incomplete sweep — is never a baseline; it goes to
    // bench_full_failed.json. bench_full.json only holds clean snapshots.
    val anyErr = failed.nonEmpty
    writeFile(if (anyErr || !complete) "bench_full_failed.json"
              else "bench_full.json", fullJson)
    println(fullJson)
    spark.stop()
    // Compact summary LAST on the normal path (driver-parsed 2000-char tail).
    println(compactJson)
    // Flag set only after the summary is out: a kill landing during
    // spark.stop() still gets a hook-emitted summary line.
    finishedNormally.set(true)
    // A round whose bench has ANY errored query is a broken round, not a
    // slow one — exit nonzero so no harness can record it as a success.
    if (anyErr) sys.exit(2)
  }
}
