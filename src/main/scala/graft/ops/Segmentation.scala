package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-level audience analytics: RFM segmentation and day-N retention.
  * Both are standard product-analytics readouts over the same event/order
  * streams every other operator here consumes, and both are integer-exact
  * (epoch-day arithmetic, cents, e6 rates) so their oracles hash-match.
  */
object Segmentation {

  /** RFM quintile segmentation over an order stream: per customer,
    * recency (last order time), frequency (order count), monetary (total
    * cents), each quintile-bucketed 1–5 by `ntile`, and the classic
    * 3-digit segment code 100·r + 10·f + m. Ties order by the entity id,
    * so bucketing is deterministic and engine-portable.
    *
    * Scale note: ntile is inherently totally-ordered — Spark plans each
    * of the three windows as a single-partition sort. That is the right
    * trade HERE because the input is the per-customer aggregate (orders
    * of magnitude smaller than the raw stream; ~1.5M rows at SF100, one
    * executor's work). For entity tables that don't collapse enough,
    * replace ntile with approx-quantile cutpoints + a broadcast bucket
    * join ([[Quantiles]]) and accept boundary fuzz.
    */
  def rfm(orders: DataFrame, custCol: String, tsSecCol: String,
          priceCentsCol: String): DataFrame = {
    val per = orders.groupBy(col(custCol).as("entity"))
      .agg(max(col(tsSecCol)).as("last_s"),
        count(lit(1)).as("n_orders"),
        sum(col(priceCentsCol)).as("total_cents"))
    def quintile(metric: String) =
      ntile(5).over(Window.orderBy(col(metric), col("entity")))
    per
      .withColumn("r", quintile("last_s"))
      .withColumn("f", quintile("n_orders"))
      .withColumn("m", quintile("total_cents"))
      .withColumn("segment", col("r") * 100 + col("f") * 10 + col("m"))
  }

  /** Day-N retention: for each activity day d, how many entities active
    * on d were also active on d + `horizonDays`. Days are integer epoch
    * days (micros div 86.4e9 — no timezone, no calendar). One distinct
    * (entity, day) aggregate, then a self equi-join on (entity, day)
    * against the horizon-shifted copy — co-partitioned, no fanout (the
    * right side is unique per key). Rates are e6 integers.
    */
  def retentionDayN(events: DataFrame, entityCol: String, tsMicrosCol: String,
                    horizonDays: Int): DataFrame = {
    require(horizonDays >= 1, "horizonDays must be >= 1")
    val act = events.select(col(entityCol).as("entity"),
        expr(s"$tsMicrosCol div 86400000000L").as("day"))
      .distinct()
    val shifted = act.select(col("entity"),
      (col("day") - horizonDays).as("day"), lit(1L).as("ret"))
    act.join(shifted, Seq("entity", "day"), "left")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"), count(col("ret")).as("n_retained"))
      .withColumn("rate_e6", expr("n_retained * 1000000L div n_active"))
  }
}
