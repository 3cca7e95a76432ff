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
    * recommendations per item: for items i, j sharing ≥ `minSupport`
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
    * ≥ minSupport survivors. */
  def itemCf(baskets: DataFrame, basketCol: String, itemCol: String,
             minSupport: Long, k: Int): DataFrame = {
    require(minSupport >= 1L && k >= 1)
    val bi = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct().localCheckpoint(true)
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
}
