package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinSizeSpec extends SparkSpec {
  import spark.implicits._

  test("joinSizeEstimate: exact product and CMS overestimate invariant") {
    // a: key 1 ×3, key 2 ×2; b: key 1 ×2, key 3 ×4 → exact = 3·2 = 6.
    val a = Seq(1L, 1L, 1L, 2L, 2L).toDF("k")
    val b = Seq(1L, 1L, 3L, 3L, 3L, 3L).toDF("k")
    val got = Sketches.joinSizeEstimate(a, "k", b, "k")
      .as[(Long, Long, Long)].head()
    assert(got._2 === 6L)
    assert(got._1 >= got._2, s"CMS must overestimate: $got")
    assert(got._3 === (got._1 - 6L) * 1000000L / 6L)
  }

  test("joinSizeEstimate: disjoint keys estimate vs exact 0") {
    val a = Seq(1L, 2L).toDF("k")
    val b = Seq(3L, 4L).toDF("k")
    val got = Sketches.joinSizeEstimate(a, "k", b, "k")
      .select("exact_rows", "over_e6")
      .as[(Long, Option[Long])].head()
    assert(got === ((0L, None)))
  }

  test("joinSizeEstimate: wide sketch is exact when keys don't collide") {
    // One key per side, same key: with w=4096 a single key pair cannot
    // self-collide upward beyond its own product in any row.
    val a = Seq.fill(7)(42L).toDF("k")
    val b = Seq.fill(5)(42L).toDF("k")
    val got = Sketches.joinSizeEstimate(a, "k", b, "k", d = 3, w = 4096)
      .as[(Long, Long, Long)].head()
    assert(got === ((35L, 35L, 0L)))
  }
}
