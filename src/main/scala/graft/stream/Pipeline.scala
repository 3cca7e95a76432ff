package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.geo.hexfunctions._

/** The reference pipeline (`heatmap_stream.py`) as composable
  * `DataFrame => DataFrame` stages. Every stage works identically on batch
  * and streaming frames — Structured Streaming incrementalizes the same
  * logical plan (SURVEY.md §3.1) — so batch re-expressions of each operator
  * stay DuckDB-oracle-checkable while `StreamingJob` runs the same code
  * against an unbounded source.
  *
  * Scale notes (100 TB): all stages are narrow except the windowed
  * aggregate (one shuffle on (window, cellId) with partial aggregation
  * map-side) and `latestByKey` (one shuffle on the vehicle key). Nothing
  * collects to the driver.
  */
object Pipeline {

  /** Declared input schema — fixed, not inferred (`heatmap_stream.py:52-61`);
    * derived from the typed model so case class and wire schema can't
    * drift. */
  val positionSchema: StructType = graft.model.Model.positionSchema

  /** P1–P4: Kafka-style binary/string `value` → typed columns.
    * PERMISSIVE `from_json` nulls out type-mismatched fields exactly like
    * the reference (`heatmap_stream.py:90-92`). */
  def parse(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), positionSchema).as("j"))
      .select(col("j.*"))
      .withColumn("eventTs", to_timestamp(col("ts")))

  /** [[parse]] with corrupt-record capture: malformed JSON keeps its raw
    * text in `_corrupt` instead of silently nulling — the dead-letter-queue
    * pattern a production ingest needs (the reference's producer skips
    * malformed rows with a log line, `mbta_to_kafka.py:75-77`; an engine
    * should retain them). */
  def parseAudited(raw: DataFrame): DataFrame = {
    val schemaWithCorrupt = positionSchema.add("_corrupt", StringType)
    raw.select(from_json(col("value").cast("string"), schemaWithCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")).as("j"))
      .select(col("j.*"))
      .withColumn("eventTs", to_timestamp(col("ts")))
  }

  /** The dead-letter leg of [[parseAudited]]. */
  def deadLetters(parsed: DataFrame): DataFrame =
    parsed.filter(col("_corrupt").isNotNull).select(col("_corrupt").as("raw"))

  /** The well-formed leg of [[parseAudited]]. */
  def wellFormed(parsed: DataFrame): DataFrame =
    parsed.filter(col("_corrupt").isNull).drop("_corrupt")

  /** F1–F2: null guards + coordinate range predicates
    * (`heatmap_stream.py:97-104`). */
  def sanitize(df: DataFrame): DataFrame =
    df.filter(col("provider").isNotNull && col("vehicleId").isNotNull &&
      col("eventTs").isNotNull &&
      col("lat").between(-90.0, 90.0) && col("lon").between(-180.0, 180.0))

  /** U1 + F3: snap to hex cell, drop rows the snap rejected
    * (`heatmap_stream.py:105-106`). */
  def snap(df: DataFrame, res: Int): DataFrame =
    df.withColumn("cellId", hex_cell_id(col("lat"), col("lon"), res))
      .filter(col("cellId").isNotNull)

  /** W1+W2+A1+P8: watermark, tumbling window, per-(window,cell) aggregate,
    * flattened projection (`heatmap_stream.py:107-132`). `count` includes
    * null-speed rows; `avg` skips nulls — both reference semantics. */
  def tiles(df: DataFrame, windowMinutes: Int = 5, watermark: String = "10 minutes"): DataFrame =
    df.withWatermark("eventTs", watermark)
      .groupBy(window(col("eventTs"), s"$windowMinutes minutes").as("w"), col("cellId"))
      .agg(
        count(lit(1)).as("cnt"),
        avg(col("speedKmh")).as("avgSpeedKmh"),
        avg(col("lon")).as("avgLon"),
        avg(col("lat")).as("avgLat"))
      .select(
        col("cellId"), col("cnt"), col("avgSpeedKmh"), col("avgLon"), col("avgLat"),
        col("w.start").as("windowStart"), col("w.end").as("windowEnd"))

  /** P9+W6: composite tile key + TTL stamp (`heatmap_stream.py:173-174`). */
  def tileKeys(df: DataFrame, city: String = "city", res: Int = 8,
               ttlMinutes: Int = 45): DataFrame =
    df.withColumn("tileKey", concat_ws("|", lit(city), lit(s"h3r$res"), col("cellId"),
        date_format(col("windowStart"), "yyyy-MM-dd'T'HH:mm:ss'Z'")))
      .withColumn("staleAt", col("windowEnd") + expr(s"interval $ttlMinutes minutes"))

  /** A2+A3 (join form): per-key argmax via grouped-max + join-back —
    * the reference's exact operator shape (`heatmap_stream.py:201-207`).
    * Ties on eventTs yield duplicate rows, as in the reference. */
  def latestByKeyJoin(df: DataFrame): DataFrame = {
    val maxTs = df.groupBy(col("provider"), col("vehicleId"))
      .agg(max(col("eventTs")).as("eventTs"))
    maxTs.join(df.select("provider", "vehicleId", "eventTs", "lat", "lon"),
      Seq("provider", "vehicleId", "eventTs"), "left")
  }

  /** Idiomatic argmax: `max_by` over a struct — one shuffle, no join, and a
    * deterministic tie-break (greatest struct wins, so greatest
    * (eventTs, event_id…) tuple). The Spark-first replacement SURVEY §2.5/A3
    * prescribes. Extra columns beyond the key are carried in `payload`. */
  def latestByKeyMaxBy(df: DataFrame, payload: Seq[String]): DataFrame = {
    val strct = struct((Seq("eventTs") ++ payload).map(col): _*)
    df.groupBy(col("provider"), col("vehicleId"))
      .agg(max_by(strct, strct).as("m"))
      .select(Seq(col("provider"), col("vehicleId"), col("m.eventTs").as("eventTs")) ++
        payload.map(c => col(s"m.$c").as(c)): _*)
  }

  /** P5+SO1: mark two heterogeneous frames and union them by name with
    * null-fill (`heatmap_stream.py:136-146`). */
  def multiplex(tilesDf: DataFrame, latestDf: DataFrame): DataFrame =
    tilesDf.withColumn("__part", lit("tiles"))
      .unionByName(latestDf.withColumn("__part", lit("latest")), allowMissingColumns = true)

  /** F4+P6: route one leg of the multiplexed stream back out
    * (`heatmap_stream.py:153-154`). */
  def route(df: DataFrame, part: String): DataFrame =
    df.where(col("__part") === part).drop("__part")
}
