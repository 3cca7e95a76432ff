package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Column-level data profiling — the quality gate a training-data pipeline
  * runs before ingesting a new batch (null rates, cardinality hints,
  * numeric ranges). One pass over the data: all per-column aggregates run
  * in a single wide aggregation, not one job per column. */
object Profile {

  /** Long-format profile: one row per column with rows/non-null/distinct
    * counts and numeric min/max (null for non-numeric). */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"nn_${f.name}"),
        countDistinct(c).as(s"nd_${f.name}")) ++ (f.dataType match {
        case _: NumericType => Seq(
          min(c).cast("double").as(s"mn_${f.name}"),
          max(c).cast("double").as(s"mx_${f.name}"))
        case _ => Seq(
          lit(null).cast("double").as(s"mn_${f.name}"),
          lit(null).cast("double").as(s"mx_${f.name}"))
      })
    } :+ count(lit(1)).as("rows_total")
    val r: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val rowsTotal = r.getAs[Long]("rows_total")
    val out = cols.map { f =>
      (f.name, rowsTotal, r.getAs[Long](s"nn_${f.name}"), r.getAs[Long](s"nd_${f.name}"),
        Option(r.getAs[java.lang.Double](s"mn_${f.name}")).map(_.doubleValue()),
        Option(r.getAs[java.lang.Double](s"mx_${f.name}")).map(_.doubleValue()))
    }.toSeq
    out.toDF("col_name", "rows_total", "non_null", "n_distinct", "min_d", "max_d")
  }
}
