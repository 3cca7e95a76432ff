package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-engagement aggregates over an event stream: DAU/WAU
  * stickiness and sequential path mining — the daily dashboard numbers a
  * serving tier computes next to the heatmap tiles.
  */
object Engagement {

  /** DAU / trailing-7-day WAU stickiness per observed epoch day.
    * The trailing distinct is computed WITHOUT a distinct-over-range
    * window (unbounded state): each (user, day) activity row SCATTERS to
    * the 7 target days it can serve (bounded ×7 fan-out), distinct
    * (user, target) pairs count per target, and only observed days
    * survive the DAU join. Output: (day, dau, wau, stick_e6).
    *
    * Scale: one (user, day) dedup exchange, one ×7 scatter dedup, two
    * keyed counts — every stage map-side combinable, no windows. */
  def stickiness(events: DataFrame, userCol: String,
                 tsCol: String): DataFrame = {
    val ud = events.select(col(userCol).as("u"),
        expr(s"unix_micros($tsCol) div 86400000000").as("day"))
      .distinct()
      .localCheckpoint(false) // one dedup feeds DAU and the scatter
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .withColumn("k", explode(expr("sequence(0L, 6L)")))
      .select(col("u"), (col("day") + col("k")).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .withColumn("stick_e6", expr("dau * 1000000L div wau"))
  }

  /** Top-`k` event-type trigrams across per-entity journeys (sequential
    * path mining): entities' events order by (ts, tie), every 3-step
    * window counts once. One entity-keyed sort window (the sessionizer
    * shuffle) + one count aggregate + top-k merge. Output:
    * (e1, e2, e3, cnt). */
  def trigrams(events: DataFrame, entityCol: String, tsCol: String,
               tieCol: String, typeCol: String, k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ent")).orderBy(col("t"), col("tie"))
    events.select(col(entityCol).as("ent"), unix_micros(col(tsCol)).as("t"),
        col(tieCol).as("tie"), col(typeCol).as("e1"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .withColumn("e3", lead(col("e1"), 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("e1"), col("e2"), col("e3"))
      .limit(k)
  }
}
