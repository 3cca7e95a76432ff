package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Sketches on streams. A count-min sketch is the rare aggregate whose
  * STREAMING state is bounded by construction: the d×w counter table is
  * the entire state, independent of how many distinct keys flow through —
  * no watermark needed (counters are monotone, never evicted), no
  * unbounded-state trap like streaming dropDuplicates. This is why CMS is
  * the standard answer to "top talkers over an infinite stream".
  */
object StreamSketch {

  /** Count-min counters over a streaming frame: a streaming groupBy whose
    * state is exactly d·w rows. Run with outputMode complete (tiny result)
    * or update. Estimates come from [[Sketches.cmsEstimate]] against any
    * epoch's counter snapshot. */
  def cmsStream(df: DataFrame, itemCol: String, d: Int = 3, w: Int = 64): DataFrame =
    (0 until d).map { j =>
      df.select(lit(j).as("j"),
        Sketches.cmsBucket(col(itemCol).cast("string"), j, w).as("bucket"))
    }.reduce(_ unionByName _)
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("c"))

  /** The histogram-quantile sketch ([[graft.ops.Quantiles]]) as a
    * streaming aggregate: state = (groups × bins) counter rows, another
    * bounded-by-construction sketch. Read quantiles off any epoch's
    * snapshot with [[graft.ops.Quantiles.fromHistogram]]. */
  def histogramStream(df: DataFrame, group: String, valueCol: String,
                      bins: Int = 256, width: Double = 2.0): DataFrame =
    df.groupBy(col(group),
        least(floor(col(valueCol) / width), lit((bins - 1).toLong)).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
}
