package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.{LatestPositionAgg, PosRec, ShingleGenerator}
import graft.stream.Pipeline

/** Queries exercising the custom Catalyst surfaces: native Generator
  * (UDTF) and typed Aggregator (UDAF). */
object ExtensionQueries {

  def defs: Seq[QueryDef] = Seq(

    // ── Native Generator UDTF: shingle histogram via a streamed Generate
    //    node (no per-row array materialization).
    QueryDef("q_shingle_hist",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), ShingleGenerator.shingles(col("text"), 3))
        .groupBy(col("shingle")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 3),
      Some("""SELECT shingle, count(*) AS cnt
             |FROM (SELECT doc_id,
             |             unnest(list_transform(range(1, len(ws) - 1),
             |                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
             |      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) w
             |      WHERE len(ws) >= 3) sh
             |GROUP BY shingle HAVING count(*) >= 3""".stripMargin)),

    // ── Typed Aggregator UDAF: the FOURTH argmax formulation (after
    //    join-back, max_by, row_number) — all checked against one oracle.
    QueryDef("q_latest_aggregator",
      (s, d) => {
        import s.implicits._
        val pos = Pipeline.sanitize(Tables.positions(s, d))
          .select(col("provider"), col("vehicleId"),
            unix_micros(col("eventTs")).as("ts_us"),
            col("event_id"), col("lat"), col("lon"))
          .as[PosRec]
        pos.groupByKey(r => (r.provider, r.vehicleId))
          .agg(LatestPositionAgg.toColumn.name("m"))
          .select(col("m.provider").as("provider"),
            col("m.vehicleId").as("vehicle_id"),
            expr("m.ts_us div 1000000").as("ts_es"),
            col("m.event_id").as("event_id"), col("m.lat").as("lat"), col("m.lon").as("lon"))
      },
      Some(CoreQueries.latestOracle))
  )
}
