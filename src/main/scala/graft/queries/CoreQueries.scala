package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.geo.HexSql
import graft.geo.hexfunctions._
import graft.stream.Pipeline
import graft.sink.Upsert

/** One named query per reference operator (SURVEY.md §2), each with ANSI
  * oracle SQL for the DuckDB gate. Conventions shared by Spark and oracle
  * sides so hashes match:
  *  - final columns lowercase snake_case, aggregates aliased identically
  *  - timestamps emitted as epoch-seconds BIGINT (`*_es`)
  *  - double aggregates rounded to 4 decimals on both sides
  *  - all cell math via [[graft.geo.HexGrid]] / [[HexSql]] (bit-identical)
  */
object CoreQueries {
  import graft.QueryDef

  private val res = 8
  /** positions subquery + its hex-snapped extension, oracle side. */
  private val pos = Tables.positionsSql
  private val posCell = HexSql.withCellId(pos, "lat", "lon", res)

  /** Oracle-side tiles aggregate (A1 batch re-expression) used by several
    * serving queries. Null-speed injection (event_id % 7) makes the
    * count-includes-nulls vs avg-skips-nulls semantics observable. */
  private val tilesSub: String =
    s"""(SELECT cell_id,
       |        CAST(floor(epoch(eventTs) / 300) * 300 AS BIGINT) AS ws_es,
       |        CAST(floor(epoch(eventTs) / 300) * 300 + 300 AS BIGINT) AS we_es,
       |        count(*) AS cnt,
       |        round(avg(CASE WHEN event_id % 7 = 0 THEN NULL ELSE speedKmh END), 4) AS avg_speed,
       |        round(avg(lon), 4) AS avg_lon,
       |        round(avg(lat), 4) AS avg_lat
       | FROM $posCell t
       | GROUP BY cell_id, floor(epoch(eventTs) / 300))""".stripMargin

  /** Spark-side positions with the same null-speed injection. */
  private def posDf(s: SparkSession, d: String): DataFrame =
    Tables.positions(s, d).withColumn("speedKmh",
      when(col("event_id") % 7 === 0, lit(null).cast("double")).otherwise(col("speedKmh")))

  /** Spark-side tiles frame: sanitize → snap → window agg → epoch columns. */
  private def tilesDf(s: SparkSession, d: String): DataFrame = {
    val snapped = Pipeline.snap(Pipeline.sanitize(posDf(s, d)), res)
    Pipeline.tiles(snapped)
      .select(col("cellId").as("cell_id"),
        unix_timestamp(col("windowStart")).as("ws_es"),
        unix_timestamp(col("windowEnd")).as("we_es"),
        col("cnt"),
        round(col("avgSpeedKmh"), 4).as("avg_speed"),
        round(col("avgLon"), 4).as("avg_lon"),
        round(col("avgLat"), 4).as("avg_lat"))
  }

  private def latestDf(s: SparkSession, d: String): DataFrame =
    Pipeline.latestByKeyMaxBy(Pipeline.sanitize(Tables.positions(s, d)),
      Seq("event_id", "lat", "lon"))

  private[queries] val latestOracle: String =
    s"""SELECT provider, vehicleId AS vehicle_id,
       |       CAST(floor(epoch(eventTs)) AS BIGINT) AS ts_es, event_id, lat, lon
       |FROM (SELECT *, row_number() OVER (PARTITION BY provider, vehicleId
       |                                   ORDER BY eventTs DESC, event_id DESC) AS rn
       |      FROM $pos p) t
       |WHERE rn = 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── The flagship pipeline: parse-equivalent → sanitize → U1 snap →
    //    5-min tumbling window (W2) → A1 aggregate → P8/P9/W6 projection.
    QueryDef("q_pipeline_tiles",
      (s, d) => tilesDf(s, d)
        .withColumn("tile_key", concat(lit("city|h3r8|"), col("cell_id"), lit("|"),
          col("ws_es").cast("string")))
        .withColumn("stale_at_es", col("we_es") + lit(2700L)),
      Some(s"""SELECT *, concat('city|h3r8|', cell_id, '|', CAST(ws_es AS VARCHAR)) AS tile_key,
              |       we_es + 2700 AS stale_at_es
              |FROM $tilesSub t""".stripMargin)),

    // ── U1 in isolation: cell occupancy histogram.
    QueryDef("q_hex_snap",
      (s, d) => Pipeline.snap(Pipeline.sanitize(Tables.positions(s, d)), res)
        .groupBy(col("cellId").as("cell_id")).agg(count(lit(1)).as("cnt")),
      Some(s"SELECT cell_id, count(*) AS cnt FROM $posCell t GROUP BY cell_id")),

    // ── F1/F2 sanitize filters over injected corruption.
    QueryDef("q_sanitize",
      (s, d) => {
        val p = Tables.positions(s, d)
          .withColumn("lat", when(col("event_id") % 97 === 0, lit(null).cast("double")).otherwise(col("lat")))
          .withColumn("lon", when(col("event_id") % 89 === 1, col("lon") + 400.0).otherwise(col("lon")))
          .withColumn("provider", when(col("event_id") % 101 === 5, lit(null).cast("string")).otherwise(col("provider")))
        Pipeline.sanitize(p).groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"), round(sum(col("lat")), 4).as("sum_lat"))
      },
      Some(s"""SELECT event_type, count(*) AS cnt, round(sum(lat), 4) AS sum_lat
              |FROM (SELECT event_type,
              |             CASE WHEN event_id % 97 = 0 THEN NULL ELSE lat END AS lat,
              |             CASE WHEN event_id % 89 = 1 THEN lon + 400.0 ELSE lon END AS lon,
              |             CASE WHEN event_id % 101 = 5 THEN NULL ELSE provider END AS provider,
              |             vehicleId, eventTs
              |      FROM $pos p) t
              |WHERE provider IS NOT NULL AND vehicleId IS NOT NULL AND eventTs IS NOT NULL
              |  AND lat BETWEEN -90 AND 90 AND lon BETWEEN -180 AND 180
              |GROUP BY event_type""".stripMargin)),

    // ── P2-adjacent: schemaless JSON field extraction from events.props.
    QueryDef("q_json_extract",
      (s, d) => Tables.events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"), col("value"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value")),
      Some("""SELECT CAST(regexp_extract(props, '"k": *(-?\d+)', 1) AS INTEGER) % 10 AS k_bucket,
             |       count(*) AS cnt, round(sum(value), 4) AS sum_value
             |FROM events GROUP BY 1""".stripMargin)),

    // ── A2+A3: the reference's argmax (grouped max + join-back, J1).
    QueryDef("q_latest_join",
      (s, d) => Pipeline.latestByKeyJoin(Pipeline.sanitize(Tables.positions(s, d)))
        .select(col("provider"), col("vehicleId").as("vehicle_id"),
          unix_timestamp(col("eventTs")).as("ts_es"), col("lat"), col("lon"))
        .distinct(),
      Some(s"""SELECT DISTINCT m.provider, m.vehicleId AS vehicle_id,
              |       CAST(floor(epoch(m.eventTs)) AS BIGINT) AS ts_es, p.lat, p.lon
              |FROM (SELECT provider, vehicleId, max(eventTs) AS eventTs
              |      FROM $pos g GROUP BY provider, vehicleId) m
              |LEFT JOIN $pos p ON m.provider = p.provider
              |  AND m.vehicleId = p.vehicleId AND m.eventTs = p.eventTs""".stripMargin)),

    // ── Idiomatic argmax via max_by (deterministic tie-break).
    QueryDef("q_latest_maxby",
      (s, d) => latestDf(s, d)
        .select(col("provider"), col("vehicleId").as("vehicle_id"),
          unix_timestamp(col("eventTs")).as("ts_es"), col("event_id"), col("lat"), col("lon")),
      Some(latestOracle)),

    // ── Same semantics via window row_number (third formulation).
    QueryDef("q_latest_window",
      (s, d) => {
        val w = Window.partitionBy(col("provider"), col("vehicleId"))
          .orderBy(col("eventTs").desc, col("event_id").desc)
        Pipeline.sanitize(Tables.positions(s, d))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("provider"), col("vehicleId").as("vehicle_id"),
            unix_timestamp(col("eventTs")).as("ts_es"), col("event_id"), col("lat"), col("lon"))
      },
      Some(latestOracle)),

    // ── A4+F6 (Q1 serving shape): all tiles of the latest window.
    QueryDef("q_top_window",
      (s, d) => {
        val t = tilesDf(s, d).select("cell_id", "ws_es", "cnt")
        t.join(broadcast(t.agg(max(col("ws_es")).as("mw"))), col("ws_es") === col("mw"))
          .drop("mw")
      },
      Some(s"""WITH t AS (SELECT cell_id, ws_es, cnt FROM $tilesSub x)
              |SELECT cell_id, ws_es, cnt FROM t
              |WHERE ws_es = (SELECT max(ws_es) FROM t)""".stripMargin)),

    // ── Q3: sort-desc + limit-1 (TakeOrderedAndProject).
    QueryDef("q_sort_limit",
      (s, d) => tilesDf(s, d).select("cell_id", "ws_es", "cnt")
        .orderBy(col("ws_es").desc, col("cell_id").desc).limit(1),
      Some(s"""SELECT cell_id, ws_es, cnt FROM $tilesSub t
              |ORDER BY ws_es DESC, cell_id DESC LIMIT 1""".stripMargin)),

    // ── SO1+P5+F4: schema-aligned union multiplex + routing, observed via
    //    the null-fill footprint of each leg.
    QueryDef("q_union_multiplex",
      (s, d) => {
        val t = tilesDf(s, d).withColumnRenamed("cell_id", "cellId")
        val mux = Pipeline.multiplex(t, latestDf(s, d))
        mux.groupBy(col("__part").as("part"))
          .agg(count(lit(1)).as("rows_cnt"),
            count(col("cellId")).as("with_cell"), count(col("lat")).as("with_lat"))
      },
      Some(s"""SELECT 'tiles' AS part, count(*) AS rows_cnt,
              |       count(*) AS with_cell, CAST(0 AS BIGINT) AS with_lat
              |FROM $tilesSub t
              |UNION ALL
              |SELECT 'latest' AS part, count(*) AS rows_cnt,
              |       CAST(0 AS BIGINT) AS with_cell, count(lat) AS with_lat
              |FROM ($latestOracle) l""".stripMargin)),

    // ── A5 roadmap op: re-aggregate the trailing 15-minute horizon per cell.
    QueryDef("q_range_merge",
      (s, d) => {
        val p = Pipeline.snap(Pipeline.sanitize(Tables.positions(s, d)), res)
        val mx = p.agg(max(col("eventTs")).as("mts"))
        p.join(broadcast(mx), col("eventTs") >= col("mts") - expr("interval 15 minutes"))
          .groupBy(col("cellId").as("cell_id"))
          .agg(count(lit(1)).as("cnt"), round(avg(col("speedKmh")), 4).as("avg_speed"))
      },
      Some(s"""SELECT cell_id, count(*) AS cnt, round(avg(speedKmh), 4) AS avg_speed
              |FROM $posCell t
              |WHERE eventTs >= (SELECT max(eventTs) FROM $pos m) - INTERVAL 15 MINUTE
              |GROUP BY cell_id""".stripMargin)),

    // ── W5: monotonic-guard upsert, replay-safe (epoch2 merged twice).
    QueryDef("q_upsert_merge",
      (s, d) => {
        val p = Pipeline.sanitize(Tables.positions(s, d))
        val epoch1 = p.filter(col("event_id") % 2 === 0)
        val epoch2 = p.filter(col("event_id") % 2 === 1)
        val keys = Seq("provider", "vehicleId")
        val once = Upsert.merge(epoch1, epoch2, keys, Seq("eventTs"), Seq("event_id", "lat", "lon"))
        val replayed = Upsert.merge(once, epoch2, keys, Seq("eventTs"), Seq("event_id", "lat", "lon"))
        replayed.select(col("provider"), col("vehicleId").as("vehicle_id"),
          unix_timestamp(col("eventTs")).as("ts_es"), col("event_id"), col("lat"), col("lon"))
      },
      Some(latestOracle)),

    // ── W6: TTL/retention compaction filter over stamped tiles.
    QueryDef("q_ttl_filter",
      (s, d) => {
        val t = tilesDf(s, d).withColumn("stale_at_es", col("we_es") + lit(2700L))
        t.join(broadcast(t.agg(max(col("we_es")).as("mwe"))),
            col("stale_at_es") > col("mwe") + lit(1200L))
          .select("cell_id", "ws_es", "stale_at_es")
      },
      Some(s"""WITH t AS (SELECT cell_id, ws_es, we_es + 2700 AS stale_at_es FROM $tilesSub x)
              |SELECT cell_id, ws_es, stale_at_es FROM t
              |WHERE stale_at_es > (SELECT max(stale_at_es) - 2700 FROM t) + 1200""".stripMargin)),

    // ── U2: boundary polygonization of occupied cells (posexplode = our
    //    Generator surface; corners are exact constants, no rounding).
    QueryDef("q_boundary",
      (s, d) => {
        val cells = Pipeline.snap(Pipeline.sanitize(Tables.positions(s, d)), res)
          .groupBy(col("cellId")).agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 3).select(col("cellId"))
        cells.select(col("cellId").as("cell_id"),
            posexplode(hex_boundary(col("cellId"))))
          .select(col("cell_id"), col("pos").as("corner_i"),
            element_at(col("col"), 1).as("lon"), element_at(col("col"), 2).as("lat"))
      },
      Some(s"""WITH cells AS (SELECT g_qi, g_ri, cell_id FROM $posCell t
              |               GROUP BY g_qi, g_ri, cell_id HAVING count(*) >= 3)
              |SELECT cell_id, i AS corner_i,
              |       ${HexSql.cornerLonSql("g_qi", "g_ri", "i", res)} AS lon,
              |       ${HexSql.cornerLatSql("g_qi", "g_ri", "i", res)} AS lat
              |FROM cells CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) c(i)""".stripMargin)),

    // ── Z-order spatial layout: occupied cells linearized by Morton code,
    //    bucketed into z-ranges (≈ output files) — per-bucket cell counts
    //    and z bounds show each bucket covers one contiguous spatial blob.
    QueryDef("q_zorder_layout",
      (s, d) => {
        val cells = Pipeline.snap(Pipeline.sanitize(Tables.positions(s, d)), res)
          .groupBy(col("cellId")).agg(count(lit(1)).as("cnt"))
          .withColumn("parts", split(col("cellId"), ":"))
          .select(col("cnt"),
            element_at(col("parts"), 2).cast("long").as("qi"),
            element_at(col("parts"), 3).cast("long").as("ri"))
        cells.withColumn("z", graft.geo.ZOrder.zvalue(col("qi"), col("ri")))
          .groupBy((col("z") / lit(1L << 12)).cast("long").as("z_bucket"))
          .agg(count(lit(1)).as("n_cells"), sum(col("cnt")).as("n_events"),
            min(col("z")).as("z_min"), max(col("z")).as("z_max"))
      },
      Some {
        val zv = graft.geo.ZOrder.zvalueSql("g_qi", "g_ri")
        s"""WITH cells AS (SELECT g_qi, g_ri, count(*) AS cnt FROM $posCell t
           |               GROUP BY g_qi, g_ri),
           |z AS (SELECT cnt, $zv AS z FROM cells)
           |SELECT z // ${1L << 12} AS z_bucket, count(*) AS n_cells,
           |       CAST(sum(cnt) AS BIGINT) AS n_events,
           |       min(z) AS z_min, max(z) AS z_max
           |FROM z GROUP BY 1""".stripMargin
      }),

    // ── Blocked fuzzy join ([[graft.ops.FuzzyJoin]]): typo'd vehicle ids
    //    resolved back to clean ids within 1 edit, candidates blocked on a
    //    2-char prefix (never cross-join).
    QueryDef("q_fuzzy_match",
      (s, d) => {
        val p = Tables.positions(s, d)
        val clean = p.select(col("vehicleId"))
        val dirty = p.filter(col("event_id") % 5 === 0)
          .select(concat(col("vehicleId"), (col("event_id") % 10).cast("string"))
            .as("vehicleId"))
        graft.ops.FuzzyJoin.byEditDistance(clean, dirty, "vehicleId")
      },
      Some(s"""WITH clean AS (SELECT DISTINCT vehicleId AS l_key,
              |                      substr(vehicleId, 1, 2) AS blk FROM $pos p),
              |dirty AS (SELECT DISTINCT concat(vehicleId, CAST(event_id % 10 AS VARCHAR)) AS r_key,
              |                 substr(concat(vehicleId, CAST(event_id % 10 AS VARCHAR)), 1, 2) AS blk
              |          FROM $pos p WHERE event_id % 5 = 0)
              |SELECT l_key, r_key, CAST(levenshtein(l_key, r_key) AS BIGINT) AS dist
              |FROM clean JOIN dirty USING (blk)
              |WHERE levenshtein(l_key, r_key) <= 1""".stripMargin)),

    // ── P12: GeoJSON Point construction (struct+array ctor, flattened for
    //    the oracle; the nested form is unit-tested).
    QueryDef("q_geojson_points",
      (s, d) => latestDf(s, d)
        .withColumn("loc", struct(lit("Point").as("type"),
          array(col("lon"), col("lat")).as("coordinates")))
        .select(col("provider"), col("vehicleId").as("vehicle_id"),
          col("loc.type").as("gj_type"),
          element_at(col("loc.coordinates"), 1).as("gj_lon"),
          element_at(col("loc.coordinates"), 2).as("gj_lat")),
      Some(s"""SELECT provider, vehicle_id, 'Point' AS gj_type,
              |       lon AS gj_lon, lat AS gj_lat FROM ($latestOracle) t""".stripMargin))
  )
}
