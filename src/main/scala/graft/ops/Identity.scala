package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-device identity stitching: resolve device-link edges into
  * identities (connected components), re-key the event stream by
  * resolved identity, and sessionize THERE — the composition that turns
  * "3 devices × fragmented visits" into "1 user × real sessions".
  * Classic warehouse identity-graph pipeline; every stage is an
  * operator this engine already ships, fused so the whole thing is
  * oracle-checkable end to end.
  */
object Identity {

  /** Per-identity rollup: devices, events, and gap-sessionized session
    * count after stitching.
    *
    * `events`: (deviceCol, tsMicrosCol). `links`: device-link edges
    * (a, b) — both endpoints must be devices present in the stream
    * (dangling links are the caller's data bug). `gapUs`: session break
    * when the gap between consecutive stitched events exceeds it.
    *
    * Scale: CC over the device graph (device count ≪ event count), one
    * broadcast-size join of labels onto events, then ONE
    * identity-keyed exchange for the session window + rollup. Session
    * flags depend only on consecutive time DELTAS, so equal-timestamp
    * orderings cannot change the session count — deterministic without
    * a tie column.
    */
  /** Per-IDENTITY funnel: resolve the device graph, re-key the event
    * stream by identity, and run the one-shuffle funnel fold there —
    * conversions that span devices (view on phone, purchase on laptop)
    * count, where a per-device funnel would strand every entity at the
    * stage its device happened to see. Returns (identity, stage). */
  def stitchFunnel(events: DataFrame, deviceCol: String,
                   tsMicrosCol: String, typeCol: String, links: DataFrame,
                   steps: Seq[String]): DataFrame = {
    val ev = events.select(col(deviceCol).as("device"),
      col(tsMicrosCol).as("t"), col(typeCol).as("et"))
    val devices = ev.select(col("device").as("id")).distinct()
    val resolved = Dedup.connectedComponents(devices, links)
      .select(col("id").as("device"), col("cluster_id").as("identity"))
    Behavior.funnelStages(ev.join(resolved, "device"),
        "identity", "t", "et", steps)
      .withColumnRenamed("entity", "identity")
  }

  def stitchSessions(events: DataFrame, deviceCol: String,
                     tsMicrosCol: String, links: DataFrame,
                     gapUs: Long): DataFrame = {
    require(gapUs > 0L, "gapUs must be positive")
    val ev = events.select(col(deviceCol).as("device"),
      col(tsMicrosCol).as("t"))
    val devices = ev.select(col("device").as("id")).distinct()
    val resolved = Dedup.connectedComponents(devices, links)
      .select(col("id").as("device"), col("cluster_id").as("identity"))
    val nDev = resolved.groupBy(col("identity"))
      .agg(count(lit(1)).as("n_devices"))
    val ord = Window.partitionBy(col("identity")).orderBy(col("t"))
    ev.join(resolved, "device")
      .withColumn("brk",
        when(lag(col("t"), 1).over(ord).isNull ||
          col("t") - lag(col("t"), 1).over(ord) > gapUs, 1L).otherwise(0L))
      .groupBy(col("identity"))
      .agg(count(lit(1)).as("n_events"), sum(col("brk")).as("n_sessions"))
      .join(nDev, "identity")
      .select(col("identity"), col("n_devices"), col("n_events"),
        col("n_sessions"))
  }
}
