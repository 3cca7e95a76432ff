package graft

/** Engine-wide invariant: every registered query is deterministic — two
  * executions produce identical multisets of rows. This is what the
  * DuckDB-oracle hash gate assumes, and what RNG-based sampling, unordered
  * collect_list, FP summation-order dependence, or time-dependent
  * expressions would silently break. Runs at sf0.001 so the whole registry
  * stays cheap. */
class DeterminismSpec extends SparkSpec {

  private def snapshot(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf())
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"`$c`"): _*)
      .collect().map(_.mkString("")).sorted.toSeq
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name is run-to-run deterministic") {
      assert(snapshot(name) === snapshot(name), s"$name differs between runs")
    }
  }
}
