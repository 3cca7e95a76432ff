package graft.ops

import graft.SparkSpec
import graft.geo.RadiusJoin

class Round6cOpsSpec extends SparkSpec {
  import spark.implicits._

  test("twoProportionTest: clearly different proportions are significant") {
    // variant 0: 50/100 convert; variant 1: 10/100 → z ≈ 6.06
    val units = ((0 until 100).map(i => (0L, if (i < 50) 1L else 0L)) ++
      (0 until 100).map(i => (1L, if (i < 10) 1L else 0L)))
      .toDF("variant", "converted")
    val r = Experiment.twoProportionTest(units, "variant", "converted")
      .selectExpr("n_a", "conv_a", "n_b", "conv_b", "significant")
      .as[(Long, Long, Long, Long, Boolean)].head()
    assert(r === ((100L, 50L, 100L, 10L, true)))
  }

  test("twoProportionTest: identical proportions are not significant") {
    val units = ((0 until 100).map(i => (0L, if (i < 30) 1L else 0L)) ++
      (0 until 100).map(i => (1L, if (i < 30) 1L else 0L)))
      .toDF("variant", "converted")
    val r = Experiment.twoProportionTest(units, "variant", "converted")
      .selectExpr("significant").as[Boolean].head()
    assert(!r)
  }

  test("twoProportionTest: boundary exactness — z² just below vs above critical") {
    // n=200/200: find a (c_a, c_b) near the 1.96 boundary and check both
    // sides flip exactly as the integer inequality dictates
    def sig(ca: Int, cb: Int): Boolean = {
      val units = ((0 until 200).map(i => (0L, if (i < ca) 1L else 0L)) ++
        (0 until 200).map(i => (1L, if (i < cb) 1L else 0L)))
        .toDF("variant", "converted")
      Experiment.twoProportionTest(units, "variant", "converted")
        .selectExpr("significant").as[Boolean].head()
    }
    def z2e4(ca: Long, cb: Long): BigInt = {
      // 1e4·z² numerator/denominator per the scaladoc identity
      val (na, nb) = (BigInt(200), BigInt(200)); val n = na + nb
      val c = BigInt(ca) + BigInt(cb)
      val num = BigInt(10000) * n * (BigInt(ca) * nb - BigInt(cb) * na).pow(2)
      val den = na * nb * c * (n - c)
      num / den
    }
    // 100 vs 80: z²e4 = ?, 100 vs 81, ... pick pairs straddling 38416
    val below = (0 to 40).find(d => z2e4(100, 100 - d) <= 38416).get
    val above = (0 to 40).find(d => z2e4(100, 100 - d) > 38416).get
    assert(!sig(100, 100 - below) && sig(100, 100 - above))
  }

  test("radius selfJoin matches brute force on a deterministic cloud") {
    val pts = (1L to 200L).map(i => (i, i * 37 % 500, i * 91 % 500))
      .toDF("id", "x", "y")
    val got = RadiusJoin.selfJoin(pts, "id", "x", "y", 60L)
      .as[(Long, Long, Long)].collect().toSet
    val raw = (1L to 200L).map(i => (i, i * 37 % 500, i * 91 % 500))
    val want = (for {
      (ia, xa, ya) <- raw; (ib, xb, yb) <- raw if ia < ib
      d = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d <= 3600
    } yield (ia, ib, d)).toSet
    assert(got === want, s"sizes got=${got.size} want=${want.size}")
  }

  test("radius selfJoin: pairs exactly at r² are included, r²+1 excluded") {
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 0L, 6L))
      .toDF("id", "x", "y")
    val got = RadiusJoin.selfJoin(pts, "id", "x", "y", 5L)
      .as[(Long, Long, Long)].collect().toSet
    // d(1,2)=25=r² kept; d(2,3)=13 kept; d(1,3)=36 dropped
    assert(got === Set((1L, 2L, 25L), (2L, 3L, 13L)))
  }
}
