package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — fixed-size frequency estimation for heavy-hitter
  * mining over unbounded key cardinality. The counter table is d rows ×
  * w buckets of BIGINTs (d·w counters TOTAL, independent of how many
  * distinct keys stream through), each bucket a partial-aggregable sum —
  * so the sketch build is one map-side-combining aggregate whose shuffle
  * is bounded by d·w rows, not by the key cardinality. Estimates are
  * `min_j counters[j][h_j(x)]`: always ≥ the true count (collisions only
  * inflate), within εN with probability 1−δ for w=⌈e/ε⌉, d=⌈ln(1/δ)⌉.
  *
  * Like [[graft.functions.KmvDistinct]], the hash is the portable md5
  * prefix ([[Dedup.hash48]]) and every counter is an integer — the sketch
  * CONTENTS reproduce bit-for-bit in any ANSI engine, so estimates are
  * oracle-checkable (no FP, no ln()).
  */
object Sketches {

  /** Bucket column for sketch row `j`. */
  def cmsBucket(item: Column, j: Int, w: Int): Column =
    Dedup.hash48(item, lit(s"cms$j")) % w

  /** Build the d×w counter table from `df(itemCol)`: one row per
    * (sketch row j, bucket, counter). */
  def cmsBuild(df: DataFrame, itemCol: String, d: Int = 3, w: Int = 64): DataFrame =
    (0 until d).map { j =>
      df.select(lit(j).as("j"), cmsBucket(col(itemCol).cast("string"), j, w).as("bucket"))
    }.reduce(_ unionByName _)
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("c"))

  /** Estimate counts for the distinct keys of `items(itemCol)` against a
    * [[cmsBuild]] counter table: join each key's d buckets, take the min.
    * The counters frame is tiny (d·w rows) — broadcast it. */
  def cmsEstimate(items: DataFrame, counters: DataFrame, itemCol: String,
                  d: Int = 3, w: Int = 64): DataFrame = {
    val keyed = (0 until d).map { j =>
      items.select(col(itemCol),
        lit(j).as("j"), cmsBucket(col(itemCol).cast("string"), j, w).as("bucket"))
    }.reduce(_ unionByName _)
    keyed.join(broadcast(counters), Seq("j", "bucket"))
      .groupBy(col(itemCol)).agg(min(col("c")).as("cms_est"))
  }

  /** Equi-join cardinality estimate from two [[cmsBuild]] counter tables
    * — the optimizer-grade "how big will this join be" sketch (AMS/CMS
    * inner product, Alon–Matias–Szegedy): per sketch row j, Σ_bucket
    * cA·cB overestimates Σ_key n_A(k)·n_B(k); min over the d rows is the
    * estimate. The exact size comes from joining the two key-count
    * frames (never the raw fact tables). Output one row:
    * (est_rows, exact_rows, over_e6 = (est−exact)·1e6 div exact) —
    * over_e6 ≥ 0 because CMS only collides upward.
    *
    * Scale: each side is one keyed count (map-side combinable) feeding
    * both the d·w counter table (tiny) and the exact-product join; the
    * sketch dot is a d·w-row join — constant-size regardless of input. */
  def joinSizeEstimate(a: DataFrame, aKey: String, b: DataFrame,
                       bKey: String, d: Int = 3, w: Int = 64): DataFrame = {
    val est = cmsBuild(a, aKey, d, w)
      .join(cmsBuild(b, bKey, d, w).withColumnRenamed("c", "cb"),
        Seq("j", "bucket"))
      .groupBy(col("j")).agg(sum(col("c") * col("cb")).as("dot"))
      .agg(min(col("dot")).as("est_rows"))
    val exact = a.groupBy(col(aKey).as("k")).agg(count(lit(1)).as("na"))
      .join(b.groupBy(col(bKey).as("k")).agg(count(lit(1)).as("nb")),
        Seq("k"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("exact_rows"))
    est.crossJoin(exact)
      .withColumn("over_e6",
        expr("""CASE WHEN exact_rows = 0 THEN NULL
               |     ELSE (est_rows - exact_rows) * 1000000L div exact_rows
               |END""".stripMargin))
  }

  /** DDSketch-style RELATIVE-error quantiles: values land in logarithmic
    * buckets `log₂(v)·1e6 div kE6` (γ = 2^(kE6/1e6), relative error
    * α ≈ (γ−1)/(γ+1)), so per-key sketch state is O(log range) counters
    * that MERGE by addition — the modern alternative to rank sketches
    * when tail latencies / price tails need bounded RELATIVE accuracy.
    * The fixed-point log₂ ([[Bm25.log2E6]]) keeps bucketing bit-exact
    * across engines, so the sketch and the landing buckets are fully
    * oracle-checkable. Values are clamped below at 1 (log domain).
    *
    * Returns for each key × requested percentile: the landing bucket
    * index, the target rank k = ⌈p·n⌉, and n — ONE count aggregate on
    * (key, bucket) + a cumulative window over the tiny bucket axis.
    * (Reconstructing a representative value 2^((b+½)·kE6/1e6) is a
    * client-side float op by design — the engine contract stays
    * integer.) */
  /** invT[i] = round(2^(i/32)·10⁶), i ∈ [0, 31] — the inverse of
    * [[Bm25.mantissaE6]]. */
  val pow2MantissaE6: IndexedSeq[Long] =
    (0 until 32).map(i => math.round(math.pow(2.0, i / 32.0) * 1e6))

  /** Fixed-point 2^x for x ≥ 0 in e6 log₂ units (the inverse of
    * [[Bm25.log2E6]], same 5-bit-mantissa accuracy ~2%):
    *   2^x ≈ (1 << ⌊x/1e6⌋) · invT[frac·32 div 1e6] div 1e6
    * — all integer, so sketch-value RECONSTRUCTION is engine-portable
    * too, not just bucketing. `colName` is a column name (string-based
    * like [[Bm25.idfE6]] because of the `div`/shift operators). */
  def pow2E6Expr(colName: String): Column = {
    val t = pow2MantissaE6.mkString("array(", "L, ", "L)")
    expr(s"""shiftleft(CAST(1 AS BIGINT), CAST(($colName) div 1000000L AS INT))
            | * element_at($t,
            |     CAST((($colName) % 1000000L) * 32 div 1000000L AS INT) + 1)
            | div 1000000L""".stripMargin)
  }

  /** SQL twin of [[pow2E6Expr]] for the DuckDB oracle. */
  def pow2E6Sql(x: String): String = {
    val t = pow2MantissaE6.mkString("[", ", ", "]")
    s"((CAST(1 AS BIGINT) << CAST(($x) // 1000000 AS INT)) * $t[CAST((($x) % 1000000) * 32 // 1000000 AS INT) + 1] // 1000000)"
  }

  /** Fixed-point 2^(−y)·10⁶ for y ≥ 0 in e6 log₂ units — the NEGATIVE
    * exponent companion of [[pow2E6Expr]] (probabilities / survival
    * curves live in [0, 1], where the plain-integer 2^x truncates to
    * junk). With y = q·10⁶ + r:
    *   2^(−y)·10⁶ = (10¹² div invT[r·32 div 10⁶]) >> q
    * — all integer, same 5-bit-mantissa accuracy. */
  def pow2NegE6Expr(colName: String): Column = {
    val t = pow2MantissaE6.mkString("array(", "L, ", "L)")
    expr(s"""shiftright(1000000000000L div element_at($t,
            |    CAST((($colName) % 1000000L) * 32 div 1000000L AS INT) + 1),
            |  CAST(($colName) div 1000000L AS INT))""".stripMargin)
  }

  /** SQL twin of [[pow2NegE6Expr]]. */
  def pow2NegE6Sql(y: String): String = {
    val t = pow2MantissaE6.mkString("[", ", ", "]")
    s"((1000000000000 // $t[CAST((($y) % 1000000) * 32 // 1000000 AS INT) + 1]) >> CAST(($y) // 1000000 AS INT))"
  }

  def logBucketQuantile(df: DataFrame, keyCol: String, valueCol: String,
                        kE6: Long, psE6: Seq[Long]): DataFrame =
    logBucketLanding(logBucketSketch(df, keyCol, valueCol, kE6), psE6)

  /** The sketch itself: per-key log-bucket counts (g, bucket, cnt).
    * Because the state is plain counts keyed by bucket, two sketches
    * MERGE by summing cnt per (g, bucket) — a groupBy, which is also
    * exactly what Spark's partial aggregation already does map-side. */
  def logBucketSketch(df: DataFrame, keyCol: String, valueCol: String,
                      kE6: Long): DataFrame = {
    require(kE6 >= 1000L && kE6 <= 1000000L, "kE6 must be in [1e3, 1e6]")
    df.select(col(keyCol).as("g"),
        Bm25.log2E6(greatest(lit(1L), col(valueCol).cast("long"))).as("l"))
      .withColumn("bucket", expr(s"l div ${kE6}L"))
      .groupBy(col("g"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches produced by [[logBucketSketch]] (rows (g, bucket,
    * cnt) from any number of shards/engines/days): counts add. */
  def mergeLogBuckets(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("g"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Landing buckets for the requested percentiles over a (possibly
    * merged) sketch. */
  def logBucketLanding(sketch: DataFrame, psE6: Seq[Long]): DataFrame = {
    require(psE6.nonEmpty && psE6.forall(p => p > 0L && p <= 1000000L),
      "each pE6 must be in (0, 1e6]")
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(col("g")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("g"))
    sketch.withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(all))
      .withColumn("p_e6", explode(array(psE6.map(lit(_)): _*)))
      .withColumn("k", expr("(n * p_e6 + 999999) div 1000000"))
      .filter(col("cum") >= col("k") && col("cum") - col("cnt") < col("k"))
      .select(col("g"), col("p_e6"), col("bucket"), col("k"), col("n"))
  }

  // ── HyperLogLog (register-based, Flajolet et al. 2007) ──────────────
  // The classic m-register estimator, all-integer so the oracle replays
  // it bit-for-bit: bucket = h % m, the rank ρ = position of the first
  // set bit in a 26-bit window of the remaining hash, registers are
  // max(ρ) per bucket (one map-side-combining aggregate — shuffle is m
  // rows regardless of input size, and registers MERGE by max, so
  // shard/day sketches combine for free). The harmonic mean is computed
  // exactly in integers by factoring out 2^ρmax:
  //   E = α_m·m² / Σ 2^(−ρ_j)  =  α_m·m²·2^ρmax / Σ 2^(ρmax−ρ_j).

  /** Number of HLL registers (2^6). */
  val hllM = 64

  /** ρ (first-set-bit position, 1-based) of a 26-bit integer `w`,
    * w = 0 → 27 — as a CASE chain evaluable identically in Spark and
    * DuckDB (no bit_length / leading-zero builtin shared by both). */
  def hllRhoSql(w: String): String = {
    val cases = (25 to 0 by -1).map(b =>
      s"WHEN ($w) >= ${1L << b} THEN ${26 - b}").mkString(" ")
    s"(CASE $cases ELSE 27 END)"
  }

  /** Column twin of [[hllRhoSql]] (same CASE chain, built innermost-out
    * so the highest bit is tested first). */
  def hllRho(w: Column): Column =
    (0 to 25).foldLeft(lit(27): Column) { (acc, b) =>
      when(w >= (1L << b), lit(26 - b)).otherwise(acc)
    }

  /** One-row HLL summary over `itemCol`: (rmax, nz_registers, s, est).
    * The register table never leaves the executors un-aggregated — the
    * shuffle is at most m rows. */
  def hll(df: DataFrame, itemCol: String): DataFrame = {
    val spark = df.sparkSession
    val h = Dedup.hash48(col(itemCol).cast("string"), lit("hll"))
    val regs = df
      .select((h % hllM).as("bucket"),
        hllRho(shiftright(h, 6).bitwiseAND(lit((1L << 26) - 1))).as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("r"))
    // zero-fill absent registers (ρ = 0 ⇒ a full 2^ρmax harmonic term)
    val filled = spark.range(hllM).select(col("id").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(coalesce(col("r"), lit(0L)).cast("long").as("r"))
    filled.agg(sort_array(collect_list(col("r"))).as("rs"))
      .select(expr("array_max(rs)").as("rmax"),
        expr("CAST(size(filter(rs, x -> x > 0)) AS BIGINT)").as("nz_registers"),
        expr("aggregate(rs, 0L, (acc, x) -> acc + shiftleft(1L, CAST(array_max(rs) - x AS INT)))").as("s"))
      .select(col("rmax"), col("nz_registers"), col("s"),
        // α_64 = 0.709 (Flajolet's constant for m = 64), in e3
        expr(s"709L * ${hllM}L * ${hllM}L * shiftleft(1L, CAST(rmax AS INT)) div (s * 1000L)")
          .as("est"))
  }

  // ── Theta/KMV set operations ────────────────────────────────────────
  // Two KMV sketches (k smallest 48-bit hashes of each set) support
  // estimated UNION / INTERSECTION / DIFFERENCE cardinalities without
  // ever joining the raw sets: merge to the union's k smallest, take
  // θ = the kth (the union sketch's threshold), then count each
  // sketch's retained hashes below θ. Estimates are c·2⁴⁸ div θ — all
  // integer, so the oracle replays them exactly. Each sketch build is a
  // TakeOrdered (top-k, no full sort); everything after is ≤ 2k rows.

  private val maxH48 = 281474976710656L // 2^48

  /** One-row estimate set: (k, theta, est_a, est_b, est_union,
    * est_inter, est_diff_ab). `dfA`/`dfB` are single-column key frames
    * (duplicates fine — hashing dedups). Caller must ensure both sets
    * have ≥ k distinct keys, else θ degenerates (documented contract,
    * mirroring the KMV aggregator's small-set fallback). */
  def thetaSetOps(dfA: DataFrame, dfB: DataFrame, k: Int): DataFrame = {
    def kmv(df: DataFrame) = df
      .select(Dedup.hash48(df.columns.head match { case c => col(c).cast("string") },
        lit("theta")).as("h"))
      .distinct().orderBy(col("h")).limit(k)
    val a = kmv(dfA).localCheckpoint(false)
    val b = kmv(dfB).localCheckpoint(false)
    val theta = a.union(b).distinct().orderBy(col("h")).limit(k)
      .agg(max(col("h")).as("theta"))
    val stats = a.select(col("h"), lit(1).as("in_a"))
      .join(b.select(col("h"), lit(1).as("in_b")), Seq("h"), "full")
      .crossJoin(broadcast(theta))
      .filter(col("h") < col("theta"))
      .agg(max(col("theta")).as("theta"),
        sum(coalesce(col("in_a"), lit(0))).as("c_a"),
        sum(coalesce(col("in_b"), lit(0))).as("c_b"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1).otherwise(0)).as("c_i"),
        sum(when(col("in_a") === 1 && col("in_b").isNull, 1).otherwise(0)).as("c_d"),
        count(lit(1)).as("c_u"))
    stats.select(lit(k.toLong).as("k"), col("theta"),
      expr(s"c_a * ${maxH48}L div theta").as("est_a"),
      expr(s"c_b * ${maxH48}L div theta").as("est_b"),
      expr(s"c_u * ${maxH48}L div theta").as("est_union"),
      expr(s"c_i * ${maxH48}L div theta").as("est_inter"),
      expr(s"c_d * ${maxH48}L div theta").as("est_diff_ab"))
  }
}
