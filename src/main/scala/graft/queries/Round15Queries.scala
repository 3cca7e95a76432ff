package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Round-15 batch: distributed PCA power iteration on the Gram matrix,
  * model-calibration audit (reliability bins), the TPC-H Q5-shaped
  * local-supplier-volume join, and per-key deterministic reservoir
  * sampling. */
object Round15Queries {

  import PortableSql.{hash48 => hash48Sql}

  private def centsCol(c: String) = floor(col(c) * 100 + 0.5).cast("long")
  private def cents(c: String) = s"CAST(floor($c * 100 + 0.5) AS BIGINT)"

  /** DuckDB unroll of [[Similarity.powerIteration]] over the 8-dim Gram
    * matrix of the embeddings table. */
  private def pcaPowerSql(dims: Int, iters: Int): String = {
    def c(i: Int) =
      s"CAST(floor(CAST(embedding AS DOUBLE[])[${i + 1}] * 1000000 + 0.5) AS BIGINT)"
    val pairs = for (i <- 0 until dims; j <- i until dims) yield (i, j)
    val comps = (0 until dims).map(i => s"${c(i)} AS c$i").mkString(",\n  ")
    val sums = pairs.map { case (i, j) => s"sum(c$i * c$j) AS g_${i}_$j" }
      .mkString(",\n  ")
    val gp = pairs.map { case (i, j) =>
      s"SELECT $i AS i, $j AS j, g_${i}_$j AS g, n_rows FROM m"
    }.mkString("\nUNION ALL\n")
    def sdiv(v: String, d: String) =
      s"(CASE WHEN ($v) >= 0 THEN ($v) // ($d) ELSE -((-($v)) // ($d)) END)"
    val its = (1 to iters).map { k =>
      s"""y$k AS (SELECT gsc.i AS i, sum(gsc.g * x${k - 1}.x) AS y
         |        FROM gsc JOIN x${k - 1} ON x${k - 1}.j = gsc.j GROUP BY 1),
         |m$k AS (SELECT max(abs(y)) AS my FROM y$k),
         |x$k AS (SELECT i AS j, ${sdiv("y", "greatest(1, my // 10000)")} AS x
         |        FROM y$k CROSS JOIN m$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH cc AS (SELECT
       |  $comps
       |  FROM embeddings),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |  $sums
       |  FROM cc),
       |gp AS ($gp),
       |sym AS (SELECT i, j, g, n_rows FROM gp
       |        UNION ALL
       |        SELECT j, i, g, n_rows FROM gp WHERE i <> j),
       |gsc AS (SELECT i, j, ${sdiv("g", "n_rows")} AS g FROM sym),
       |x0 AS (SELECT range AS j, CAST(10000 AS BIGINT) AS x FROM range($dims)),
       |$its
       |SELECT CAST(j AS BIGINT) AS i, CAST(x AS BIGINT) AS x_e4 FROM x$iters""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(

    // ── Distributed PCA: top-eigenvector estimate of the 8-dim Gram
    //    matrix by 3 all-integer power-iteration rounds; every frame
    //    after the one Gram aggregate is dims-sized.
    QueryDef("q_pca_power",
      (s, d) => Similarity.powerIteration(
        Similarity.gramMatrix(Tables.embeddings(s, d), 8), 8, 3),
      Some(pcaPowerSql(8, 3))),

    // ── Calibration audit (reliability diagram): doc length rescaled
    //    to [0,1] e6 as the "confidence" that a document is English,
    //    binned into deciles; per bin the confidence mean, empirical
    //    accuracy, and |gap| — the ECE terms.
    QueryDef("q_calibration_ece",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("n_chars"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en"))
        val mx = docs.agg(max(col("n_chars")).as("mx"))
        docs.crossJoin(broadcast(mx))
          .withColumn("conf_e6", expr("n_chars * 1000000L div mx"))
          .withColumn("bin", expr("least(9L, conf_e6 * 10 div 1000000L)"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            expr("sum(conf_e6) div count(1)").as("conf_avg_e6"),
            expr("sum(is_en) * 1000000L div count(1)").as("acc_e6"))
          .withColumn("gap_e6", abs(col("acc_e6") - col("conf_avg_e6")))
      },
      Some("""WITH docs AS (SELECT n_chars,
             |                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
             |              FROM documents),
             |mx AS (SELECT max(n_chars) AS mx FROM docs),
             |sc AS (SELECT is_en, n_chars * 1000000 // mx AS conf_e6
             |       FROM docs CROSS JOIN mx),
             |b AS (SELECT is_en, conf_e6,
             |             least(9, conf_e6 * 10 // 1000000) AS bin FROM sc)
             |SELECT bin, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(conf_e6) // count(*) AS BIGINT) AS conf_avg_e6,
             |       CAST(sum(is_en) * 1000000 // count(*) AS BIGINT) AS acc_e6,
             |       CAST(abs(sum(is_en) * 1000000 // count(*)
             |                - sum(conf_e6) // count(*)) AS BIGINT) AS gap_e6
             |FROM b GROUP BY 1""".stripMargin)),

    // ── TPC-H Q5 shape: revenue from lineitems where supplier and
    //    customer share a nation, within one region and a two-year
    //    window. ONE big shuffle join (orders ⋈ lineitem); customer /
    //    supplier / nation⋈region all broadcast.
    QueryDef("q_tpch_local_volume",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
          centsCol("l_extendedprice").as("pc"), centsCol("l_discount").as("dc"))
        val o = Tables.orders(s, d)
          .filter(unix_timestamp(col("o_orderdate")).between(757382400L, 820454399L))
          .select(col("o_orderkey"), col("o_custkey"))
        val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
        val su = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        val nr = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")
            .select(col("r_regionkey"))), col("n_regionkey") === col("r_regionkey"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey")
            && col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("pc") * (lit(100L) - col("dc"))).as("rev_cp"))
      },
      Some(s"""SELECT n_name, CAST(count(*) AS BIGINT) AS n_items,
              |       CAST(sum(${cents("l_extendedprice")}
              |                * (100 - ${cents("l_discount")})) AS BIGINT) AS rev_cp
              |FROM lineitem
              |JOIN orders   ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |              AND s_nationkey = c_nationkey
              |JOIN nation   ON s_nationkey = n_nationkey
              |JOIN region   ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |  AND CAST(floor(epoch(o_orderdate)) AS BIGINT) BETWEEN 757382400 AND 820454399
              |GROUP BY 1""".stripMargin)),

    // ── Per-key deterministic reservoir: 5 uniform sample rows per
    //    event type via hash-rank top-k — the bounded-memory per-group
    //    sampler (rank agg is a windowed top-k, no global sort).
    QueryDef("q_reservoir_perkey",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val h = graft.ops.Dedup.hash48(col("event_id").cast("string"), lit("res"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("h"), col("event_id"))
        Tables.events(s, d).select(col("event_type"), col("event_id"))
          .withColumn("h", h)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("event_type"), col("rn").cast("long").as("rn"), col("event_id"))
      },
      Some {
        val h = hash48Sql("CAST(event_id AS VARCHAR)", "'res'")
        s"""WITH r AS (SELECT event_type, event_id, $h AS h FROM events),
           |rk AS (SELECT event_type, event_id,
           |              row_number() OVER (PARTITION BY event_type
           |                                 ORDER BY h, event_id) AS rn
           |       FROM r)
           |SELECT event_type, CAST(rn AS BIGINT) AS rn, event_id
           |FROM rk WHERE rn <= 5""".stripMargin
      })
  )
}
