package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-shuffle join pruning — the semi-join reduction that
  * matters at 100 TB: when a selective dimension joins a huge fact, the
  * fact side normally shuffles ALL its rows and the join discards most of
  * them post-exchange. Building a compact Bloom filter from the dim keys
  * and filtering the fact BEFORE its exchange moves the discard to the
  * map side — shuffle bytes drop by the join's selectivity, at the cost
  * of one tiny aggregate + a broadcast bitmap. (Spark's AQE injects the
  * same idea as `InjectRuntimeFilter`; this is the explicit, engine-owned
  * form with a portable hash so the pruning decision is auditable.)
  *
  * The filter is RESULT-NEUTRAL: false positives only let extra rows
  * through to the real join, which discards them — output is bit-identical
  * to the unpruned join (what the oracle checks). False-negative rate is
  * zero by construction.
  *
  * Mechanics: k bit positions per key via the portable 48-bit md5 hash
  * ([[Dedup.hash48]]) under k salts, bitmap of m bits packed into m/64
  * longs. The bitmap is built with one distinct + collect of ≤ m integers
  * (bounded by the FILTER size, not the dim cardinality) and embedded as
  * an array literal, so the fact-side membership test is a codegen'd
  * array-index + shift — no UDF, no broadcast variable plumbing.
  */
object BloomJoin {

  /** Bit positions (0-based) a key sets/tests: k disjoint 8-hex-char
    * slices of ONE md5 digest, mod m (k ≤ 4). One digest per row instead
    * of k salted digests — same independence for bit-setting purposes,
    * a third the hashing cost on the (huge) fact side, and the digest
    * subexpression is shared across the k slices by codegen. */
  private def positions(key: Column, m: Int, k: Int): Seq[Column] = {
    require(k <= 4, "positions are sliced from one md5 digest (32 hex chars)")
    val hx = md5(concat(lit("bloom|"), key))
    (0 until k).map(i =>
      conv(substring(hx, i * 8 + 1, 8), 16, 10).cast("long") % m)
  }

  /** Build the m-bit bitmap from the distinct keys of `dim(keyCol)`.
    * Driver materializes ≤ m set-bit positions (the aggregate output —
    * tiny and bounded), never the dim rows. */
  def buildBitmap(dim: DataFrame, keyCol: String, m: Int = 1 << 13,
                  k: Int = 3): Array[Long] = {
    require(m % 64 == 0, "bitmap bits must pack into longs")
    val pos = positions(col(keyCol).cast("string"), m, k)
    val set = dim.select(explode(array(pos: _*)).as("p")).distinct()
      .collect().map(_.getLong(0))
    val bitmap = new Array[Long](m / 64)
    set.foreach(p => bitmap(p.toInt / 64) |= 1L << (p.toInt % 64))
    bitmap
  }

  /** Membership test column: all k bits set in `bitmap`. */
  def mightContain(key: Column, bitmap: Array[Long], k: Int = 3): Column = {
    val m = bitmap.length * 64
    val litMap = array(bitmap.map(lit(_)): _*)
    positions(key, m, k).map { p =>
      BitOps.shiftRight(element_at(litMap, (p / 64).cast("int") + 1), p % 64)
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Equi-join `fact ⋈ dim` on `factKey = dimKey`, with the fact side
    * Bloom-pruned before the join. Result ≡ the plain join. */
  def pruneJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                dimKey: String, m: Int = 1 << 13, k: Int = 3): DataFrame = {
    val bitmap = buildBitmap(dim.select(col(dimKey)), dimKey, m, k)
    fact.filter(mightContain(col(factKey).cast("string"), bitmap, k))
      .join(dim, col(factKey) === col(dimKey))
  }
}
