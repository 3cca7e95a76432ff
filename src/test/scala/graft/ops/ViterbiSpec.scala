package graft.ops

import graft.SparkSpec

class ViterbiSpec extends SparkSpec {
  import spark.implicits._

  /** Plain sequential max-plus fold — the textbook definition the
    * doubling reduction must equal. */
  private def seqReduce(ms: Seq[(Long, Long, Long, Long)]) =
    ms.reduceLeft { (a, b) =>
      (math.max(a._1 + b._1, a._2 + b._3),
        math.max(a._1 + b._2, a._2 + b._4),
        math.max(a._3 + b._1, a._4 + b._3),
        math.max(a._3 + b._2, a._4 + b._4))
    }

  private def dfOf(ms: Seq[(Long, Long, Long, Long)]) =
    ms.zipWithIndex.map { case ((a, b, c, dd), i) =>
      (i.toLong, a, b, c, dd)
    }.toDF("idx", "m00", "m01", "m10", "m11")

  test("doubling reduction equals the sequential max-plus fold (odd and even lengths)") {
    // deterministic pseudo-random-ish log-probs, lengths crossing every
    // odd/even split the pairing loop can hit
    def mats(n: Int) = (1 to n).map { i =>
      (-(i * 7L % 13) * 1000L, -(i * 11L % 17) * 1000L,
        -(i * 5L % 7) * 1000L, -(i * 3L % 19) * 1000L)
    }
    Seq(1, 2, 3, 5, 8, 13, 30).foreach { n =>
      val ms = mats(n)
      val got = Viterbi.reduceMaxPlus(dfOf(ms))
        .as[(Long, Long, Long, Long)].head()
      assert(got === seqReduce(ms), s"length $n diverged")
    }
  }

  test("prefix and suffix scans equal the sequential running products at every position") {
    def mats(n: Int) = (1 to n).map { i =>
      (-(i * 7L % 13) * 1000L, -(i * 11L % 17) * 1000L,
        -(i * 5L % 7) * 1000L, -(i * 3L % 19) * 1000L)
    }
    def combine(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)) =
      (math.max(a._1 + b._1, a._2 + b._3),
        math.max(a._1 + b._2, a._2 + b._4),
        math.max(a._3 + b._1, a._4 + b._3),
        math.max(a._3 + b._2, a._4 + b._4))
    Seq(1, 2, 5, 30).foreach { n =>
      val ms = mats(n)
      val pfxExp = ms.tail.scanLeft(ms.head)((acc, m) => combine(acc, m))
      val sfxExp = ms.init.scanRight(ms.last)((m, acc) => combine(m, acc))
      def got(forward: Boolean) =
        Viterbi.scanMaxPlus(dfOf(ms), forward)
          .orderBy("idx").as[(Long, Long, Long, Long, Long)].collect()
          .map(t => (t._2, t._3, t._4, t._5)).toSeq
      assert(got(forward = true) === pfxExp, s"prefix scan length $n")
      assert(got(forward = false) === sfxExp, s"suffix scan length $n")
    }
  }

  test("NEG sentinel survives combination without overflow") {
    val ms = Seq(
      (0L, Viterbi.NEG, Viterbi.NEG, 0L),      // diagonal (identity-ish)
      (-5L, Viterbi.NEG, Viterbi.NEG, -7L))
    val got = Viterbi.reduceMaxPlus(dfOf(ms))
      .as[(Long, Long, Long, Long)].head()
    assert(got._1 === -5L && got._4 === -7L)
    assert(got._2 < -1000000000L && got._3 < -1000000000L)
  }
}
