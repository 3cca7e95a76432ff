package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Collaborative-filtering primitives over basket data — the
  * "customers who bought X also bought Y" stage, built from keyed
  * joins and aggregates so nothing materializes the user×item matrix.
  */
object Recsys {

  /** Item-item cosine similarity over co-occurrence baskets, top `k`
    * recommendations per item. NOTE: baskets larger than
    * `maxBasketSize` (default 256) are truncated to their smallest
    * `maxBasketSize` item ids BEFORE pairing — results over mega-baskets
    * therefore differ from an uncapped implementation by design; pass
    * `maxBasketSize = Int.MaxValue` for uncapped semantics (see the
    * skew-guard paragraph for why the cap defaults ON).
    *
    * For items i, j sharing ≥ `minSupport`
    * baskets, score by cos²(i,j) = c_ij² / (c_i·c_j) — the SQUARED
    * cosine is an exact e12 integer (c_ij²·10¹² div c_i·c_j), and
    * squaring preserves the ranking cosine gives on non-negative
    * counts. Ties break toward the smaller partner id. Output:
    * (item, rec, n_co, cos2_e12, rk), both directions of every pair.
    *
    * Scale: the pair generation self-joins baskets on the BASKET key,
    * so fan-out is bounded by basket size squared (baskets are small
    * by nature), never by catalog size; item totals ride in from a
    * pre-aggregate; the per-item top-k is one keyed window over the
    * ≥ minSupport survivors.
    *
    * Skew guard: fan-out is basket-size SQUARED, so one adversarial
    * mega-basket (a crawler account, a shared kiosk login) would square
    * — 10⁶ items → 10¹² pairs in a single task. `maxBasketSize` caps
    * every basket to its smallest `maxBasketSize` item ids BEFORE the
    * self-join (deterministic rank, so an oracle can apply the
    * identical rule), and the item totals are computed from the capped
    * frame so cosine denominators stay consistent with the pair
    * counts. The cap bounds any task at maxBasketSize² pairs; baskets
    * under the cap are untouched. */
  def itemCf(baskets: DataFrame, basketCol: String, itemCol: String,
             minSupport: Long, k: Int,
             maxBasketSize: Int = 256): DataFrame = {
    require(minSupport >= 1L && k >= 1 && maxBasketSize >= 2)
    val bi = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
      .withColumn("brk", row_number().over(
        Window.partitionBy(col("b")).orderBy(col("i"))))
      .filter(col("brk") <= maxBasketSize).drop("brk")
      .localCheckpoint(false)
    val itot = bi.groupBy(col("i")).agg(count(lit(1)).as("ci"))
    val co = bi.as("x").join(bi.as("y"),
        col("x.b") === col("y.b") && col("x.i") =!= col("y.i"))
      .groupBy(col("x.i").as("item"), col("y.i").as("rec"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minSupport)
    co.join(itot.select(col("i").as("item"), col("ci").as("ca")), "item")
      .join(itot.select(col("i").as("rec"), col("ci").as("cb")), "rec")
      .selectExpr("item", "rec", "n_co",
        "n_co * n_co * 1000000000000L div (ca * cb) AS cos2_e12")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("item"))
          .orderBy(col("cos2_e12").desc, col("rec"))))
      .filter(col("rk") <= k)
      .select(col("item"), col("rec"), col("n_co"), col("cos2_e12"), col("rk"))
  }

  /** Offline recall@k of the [[itemCf]] recommender: train on one
    * basket set, then for every (basket, item) pair of the TEST set
    * that has at least one co-basket partner, score a hit iff any
    * partner appears in the item's top-k training recommendations.
    * recall_e6 = hits·10⁶ div evaluable items — the standard
    * leave-forward evaluation of a co-occurrence recommender. Output
    * one row: (n_eval, n_hits, recall_e6).
    *
    * Scale: the train side is [[itemCf]] (bounded basket fan-out); the
    * test side pairs within baskets only; the hit test is one keyed
    * semi-join of test pairs against the recs table. */
  def recallAtK(train: DataFrame, test: DataFrame, basketCol: String,
                itemCol: String, minSupport: Long, k: Int): DataFrame = {
    val recs = itemCf(train, basketCol, itemCol, minSupport, k)
      .select(col("item"), col("rec"))
    val ti = test.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct().localCheckpoint(false)
    val pairs = ti.as("x").join(ti.as("y"),
        col("x.b") === col("y.b") && col("x.i") =!= col("y.i"))
      .select(col("x.b").as("b"), col("x.i").as("item"),
        col("y.i").as("rec"))
    val evalItems = pairs.select(col("b"), col("item")).distinct()
    val hits = pairs.join(recs, Seq("item", "rec"), "left_semi")
      .select(col("b"), col("item")).distinct()
    evalItems.agg(count(lit(1)).as("n_eval"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .selectExpr("n_eval", "n_hits",
        "n_hits * 1000000 div n_eval AS recall_e6")
  }
}
