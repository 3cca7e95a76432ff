package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineNdSpec extends SparkSpec {
  import spark.implicits._

  /** Reference quadratic dominance check (all dims minimized). */
  private def naive(rows: Seq[Seq[Long]]): Set[Seq[Long]] =
    rows.filterNot { p =>
      rows.exists(q => q.zip(p).forall { case (a, b) => a <= b } && q != p &&
        q.zip(p).exists { case (a, b) => a < b })
    }.toSet

  test("skylineND(4): matches the quadratic reference on random points") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)(Seq.fill(4)(rnd.nextInt(8).toLong))
    val df = rows.map { case Seq(a, b, c, d) => (a, b, c, d) }
      .toDF("d1", "d2", "d3", "d4")
    val got = Skyline.skylineND(df, Seq("d1", "d2", "d3", "d4"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (a, b, c, d) => Seq(a, b, c, d) }.toSet
    assert(got === naive(rows))
  }

  test("skylineND(2): degenerates to the 2-D frontier") {
    val rows = Seq(Seq(1L, 5L), Seq(2L, 3L), Seq(3L, 3L), Seq(4L, 1L))
    val df = rows.map { case Seq(a, b) => (a, b) }.toDF("d1", "d2")
    val got = Skyline.skylineND(df, Seq("d1", "d2"))
      .as[(Long, Long)].collect().map { case (a, b) => Seq(a, b) }.toSet
    assert(got === Set(Seq(1L, 5L), Seq(2L, 3L), Seq(4L, 1L)))
  }

  test("skylineND: coordinate-tied duplicates survive together") {
    val df = Seq((1L, 1L, 9L), (1L, 1L, 9L), (2L, 2L, 9L))
      .toDF("d1", "d2", "d3")
    val got = Skyline.skylineND(df, Seq("d1", "d2", "d3")).collect()
    assert(got.length === 2)
  }

  test("skylineND(5): middle-dim reversal is not falsely pruned") {
    // (0, 9, 0, 0, 0) and (1, 0, 1, 1, 1): neither dominates — both survive.
    // A sweep partitioned only by d1 would see them in one partition and
    // could prune wrongly; the fixed-prefix sweep must keep both.
    val rows = Seq(Seq(0L, 9L, 0L, 0L, 0L), Seq(1L, 0L, 1L, 1L, 1L),
      Seq(1L, 9L, 1L, 1L, 1L)) // third is dominated by the first
    val df = rows.map { case Seq(a, b, c, d, e) => (a, b, c, d, e) }
      .toDF("d1", "d2", "d3", "d4", "d5")
    val got = Skyline.skylineND(df, Seq("d1", "d2", "d3", "d4", "d5"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (a, b, c, d, e) => Seq(a, b, c, d, e) }.toSet
    assert(got === Set(rows(0), rows(1)))
  }
}
