package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ABC / Pareto classification — "which 20% of parts carry 80% of
  * revenue": every item is classed A/B/C by where the global
  * revenue-descending cumulative share crosses `aPct`/`bPct`.
  *
  * The global ordered prefix sum is THE classic unscalable plan (one
  * all-data window partition), so it runs BANDED two-phase instead:
  * items bucket by the bit length of their value (bin-string length —
  * integer-exact in any engine, and order-compatible: every item of a
  * higher band outranks every item of a lower band), the ≤64 band
  * totals cumulate on a bounded-by-construction tiny frame, and each
  * item adds its within-band prefix (band-keyed window) to its band's
  * broadcast offset. Same shape as distributed sort-prefix-sum; no
  * partition ever sees more than one band.
  */
object Pareto {

  /** Class A/B/C summary of `items` (idCol, centsCol ≥ 0): an item is A
    * while the EXCLUSIVE cumulative share (rows strictly ahead in
    * (value desc, id) order) is below `aPct`%, B below `bPct`%, else C —
    * so the item crossing a boundary still belongs to the upper class.
    * All comparisons are integer-exact. Output:
    * (cls, n_items, rev_cents, share_e6). */
  def abcClasses(items: DataFrame, idCol: String, centsCol: String,
                 aPct: Int = 80, bPct: Int = 95): DataFrame = {
    require(0 < aPct && aPct < bPct && bPct < 100)
    val it = items.select(col(idCol).as("id"),
        col(centsCol).cast("long").as("v"))
      .withColumn("band", length(bin(col("v"))).cast("long"))
      .localCheckpoint(false) // one pass feeds bands AND the item walk
    val bands = it.groupBy(col("band"))
      .agg(sum(col("v")).as("bv"), count(lit(1)).as("bn"))
    // ≤ 64 rows: the cross-band cumulative runs on a bounded tiny frame.
    val wBands = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = bands
      .withColumn("off", coalesce(sum(col("bv")).over(wBands), lit(0L)))
      .select(col("band"), col("off"))
    val tot = it.agg(sum(col("v")).as("t"))
    val wIn = Window.partitionBy(col("band"))
      .orderBy(col("v").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    it.withColumn("pre", coalesce(sum(col("v")).over(wIn), lit(0L)))
      .join(broadcast(offs), Seq("band"))
      .crossJoin(broadcast(tot))
      .withColumn("cum_excl", col("off") + col("pre"))
      .withColumn("cls",
        when(col("cum_excl") * 100 < lit(aPct.toLong) * col("t"), "A")
          .when(col("cum_excl") * 100 < lit(bPct.toLong) * col("t"), "B")
          .otherwise("C"))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_items"), sum(col("v")).as("rev_cents"),
        // class revenue × 1e6 can pass 2^63 — ride DECIMAL(38,0)
        expr("""CAST(CAST(sum(v) AS DECIMAL(38,0)) * 1000000
               |     div max(t) AS BIGINT) AS share_e6""".stripMargin))
  }

  /** Herfindahl–Hirschman concentration index per group: each member's
    * share of the group total in basis points (truncating e4 division),
    * HHI = Σ share_bp² — the e8-scaled standard 0–10000² index
    * ([[abcClasses]] ranks the head; HHI summarizes the whole
    * distribution in one number, the antitrust screen). Output:
    * (g, n_members, total_cents, hhi_e8).
    *
    * Scale: one (group, member) aggregate off the raw scan, then a
    * group-keyed rollup — the member axis never leaves its group
    * partition. */
  def hhi(df: DataFrame, groupCol: String, memberCol: String,
          centsCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol).as("g"), col(memberCol).as("m"))
      .agg(sum(col(centsCol)).as("rev"))
    val tot = per.groupBy(col("g"))
      .agg(sum(col("rev")).as("tot"), count(lit(1)).as("n_members"))
    per.join(tot, "g")
      .withColumn("share_bp", expr("rev * 10000 div tot"))
      .groupBy(col("g"))
      .agg(max(col("n_members")).as("n_members"),
        max(col("tot")).as("total_cents"),
        sum(expr("share_bp * share_bp")).as("hhi_e8"))
  }

  /** Kneedle knee detection on the concentration curve: keys sorted by
    * value descending, x = rank/n, y = cumulative share; the knee is
    * argmax(y − x) — the point of diminishing returns where adding the
    * next key stops paying ("how many top brands actually matter"), the
    * operating point [[abcClasses]]' fixed 80/95 cuts approximate. All
    * integer: shares and ranks are e6 truncating divisions, the argmax
    * is min-rank-tiebroken. Output one row:
    * (n_points, knee_rank, knee_key, knee_x_e6, knee_y_e6, knee_gap_e6).
    *
    * Scale: the window runs on the KEY axis (brand/segment cardinality,
    * not row count) — callers aggregate the raw scan to per-key totals
    * first, so the sort input is bounded. */
  def kneedle(perKey: DataFrame, keyCol: String,
              centsCol: String): DataFrame = {
    val t = perKey.select(col(keyCol).cast("string").as("k"),
      col(centsCol).cast("long").as("v"))
    val ord = Window.orderBy(col("v").desc, col("k"))
    t.withColumn("r", row_number().over(ord).cast("long"))
      .withColumn("cum", sum(col("v")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("tot", sum(col("v")).over(Window.partitionBy()))
      .selectExpr("k", "r", "n",
        "r * 1000000 div n AS x_e6",
        "cum * 1000000 div tot AS y_e6")
      .withColumn("gap", col("y_e6") - col("x_e6"))
      .withColumn("pick", row_number().over(
        Window.orderBy(col("gap").desc, col("r"))))
      .where(col("pick") === 1)
      .selectExpr("n AS n_points", "r AS knee_rank", "k AS knee_key",
        "x_e6 AS knee_x_e6", "y_e6 AS knee_y_e6", "gap AS knee_gap_e6")
  }
}
