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
      Some(CoreQueries.latestOracle)),

    // ── Bounded-heap top-k Aggregator: O(k) state per partition instead
    //    of a global sort; same oracle as the brute-force TakeOrdered form.
    QueryDef("q_sim_topk_agg",
      (s, d) => {
        import s.implicits._
        import graft.functions.{Scored, TopKAgg}
        import graft.ops.Similarity
        val e = Similarity.cast(Tables.embeddings(s, d))
        val q = e.filter(col("vec_id") === 0).select(col("ev").as("qv"))
        val scored = e.filter(col("vec_id") > 0).select(col("vec_id"), col("ev"))
          .crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(Similarity.cosine(col("ev"), col("qv")), 6).as("cos"))
          .as[Scored]
        // the Aggregator's product output is flattened: column `items`
        scored.select(new TopKAgg(10).toColumn.name("top"))
          .select(explode(col("items")).as("x"))
          .select(col("x.vec_id").as("vec_id"), col("x.cos").as("cos"))
      },
      Some("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings WHERE vec_id > 0)
             |SELECT vec_id,
             |       round(list_dot_product(ev, qv) /
             |             (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
             |FROM e, q
             |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin)),

    // ── Column-level data profiling (single-pass wide aggregation) — the
    //    pre-ingest quality gate of a training-data pipeline.
    QueryDef("q_data_profile",
      (s, d) => graft.ops.Profile.profile(Tables.events(s, d)),
      Some {
        val numeric = Map("event_id" -> true, "ts" -> false, "user_id" -> true,
          "event_type" -> false, "value" -> true, "props" -> false)
        Seq("event_id", "ts", "user_id", "event_type", "value", "props").map { c =>
          val mn = if (numeric(c)) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
          val mx = if (numeric(c)) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
          s"""SELECT '$c' AS col_name, count(*) AS rows_total, count($c) AS non_null,
             |       count(DISTINCT $c) AS n_distinct, $mn AS min_d, $mx AS max_d
             |FROM events""".stripMargin
        }.mkString("\nUNION ALL\n")
      }),

    // ── TypedImperativeAggregate surface: exact-distinct sketch with a
    //    serialized imperative buffer, checked against count(DISTINCT).
    QueryDef("q_distinct_sketch",
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(graft.functions.ExactDistinct.exact_distinct(col("user_id")).as("dusers"),
          count(lit(1)).as("cnt")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS dusers, count(*) AS cnt
             |FROM events GROUP BY event_type""".stripMargin))
  )
}
