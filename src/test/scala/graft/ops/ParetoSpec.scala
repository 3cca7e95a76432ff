package graft.ops

import graft.SparkSpec

class ParetoSpec extends SparkSpec {
  import spark.implicits._

  test("abcClasses: textbook 80/95 split") {
    // Values 50, 30, 15, 5 (total 100): exclusive cums 0, 50, 80, 95.
    // A: 0 < 80 and 50 < 80 → {50, 30}; B: 80 < 95 → {15}; C: {5}.
    val items = Seq((1L, 50L), (2L, 30L), (3L, 15L), (4L, 5L))
      .toDF("id", "cents")
    val got = Pareto.abcClasses(items, "id", "cents")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("A") === ("A", 2L, 80L, 800000L))
    assert(got("B") === ("B", 1L, 15L, 150000L))
    assert(got("C") === ("C", 1L, 5L, 50000L))
  }

  test("abcClasses: banded prefix equals the global ordered prefix") {
    // Values spanning many bit-length bands, with duplicates (ties break
    // by id) — compare against a straight in-memory cumulative walk.
    val vals = (1L to 200L).map(i => (i, (i * 37 % 1000) + 1))
    val got = Pareto.abcClasses(vals.toDF("id", "cents"), "id", "cents")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val total = vals.map(_._2).sum
    val sorted = vals.sortBy { case (id, v) => (-v, id) }
    var cum = 0L
    val classed = sorted.map { case (_, v) =>
      val c = if (cum * 100 < 80 * total) "A"
        else if (cum * 100 < 95 * total) "B" else "C"
      cum += v
      (c, v)
    }
    for (cls <- Seq("A", "B", "C")) {
      val exp = classed.filter(_._1 == cls)
      assert(got(cls)._2 === exp.size.toLong, s"n_items $cls")
      assert(got(cls)._3 === exp.map(_._2).sum, s"rev $cls")
    }
  }

  test("abcClasses: boundary-crossing item belongs to the upper class") {
    // 80 then 20: the first item's exclusive cum is 0 (< 80%) → A even
    // though it alone crosses the 80% line; second starts at 80 → B.
    val items = Seq((1L, 80L), (2L, 20L)).toDF("id", "cents")
    val got = Pareto.abcClasses(items, "id", "cents")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("A")._2 === 1L && got("A")._3 === 80L)
    assert(got("B")._2 === 1L && got("B")._3 === 20L)
    assert(!got.contains("C"))
  }
}
