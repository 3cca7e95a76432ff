package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Similarity}
import org.apache.spark.sql.functions._

/** Round-58 batch: second principal component via Hotelling deflation
  * (PCA beyond q_pca_power's top direction — the first step toward a
  * full spectral readout), a Simpson's-paradox reversal detector
  * (per-group vs pooled trend sign, the aggregation trap every
  * dashboard rollup risks), and log-log price elasticity per brand
  * (the econometric slope over fixed-point log₂ moments).
  */
object Round58Queries {

  /** DuckDB unroll of [[Similarity.powerIterationDeflated]]: the
    * q_pca_power chain, then Rayleigh λ₁ + rank-one deflation, then the
    * same iteration over the deflated matrix. */
  private def pcaDeflationSql(dims: Int, iters: Int): String = {
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
    // Join key mirrors the Spark side exactly: x arrives keyed by j,
    // y_i = Σ_j g(i,j)·x(j).
    def loopJ(src: String, prev: String, k: Int, tag: String) =
      s"""y$tag$k AS (SELECT $src.i AS i, sum($src.g * $prev.x) AS y
         |        FROM $src JOIN $prev ON $prev.j = $src.j GROUP BY 1),
         |m$tag$k AS (SELECT max(abs(y)) AS my FROM y$tag$k),
         |x$tag$k AS (SELECT i AS j, ${sdiv("y", "greatest(1, my // 10000)")} AS x
         |        FROM y$tag$k CROSS JOIN m$tag$k)""".stripMargin
    val its1 = (1 to iters).map(k =>
      loopJ("gsc", if (k == 1) "xa0" else s"xa${k - 1}", k, "a"))
      .mkString(",\n")
    val its2 = (1 to iters).map(k =>
      loopJ("g2", if (k == 1) "xb0" else s"xb${k - 1}", k, "b"))
      .mkString(",\n")
    s"""WITH cc AS (SELECT
       |  $comps
       |  FROM embeddings),
       |m AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |  $sums
       |  FROM cc),
       |gp AS ($gp),
       |sym AS (SELECT i, j, g, n_rows FROM gp
       |        UNION ALL
       |        SELECT j, i, g, n_rows FROM gp WHERE i <> j),
       |gsc AS MATERIALIZED (SELECT i, j, ${sdiv("g", "n_rows")} AS g FROM sym),
       |xa0 AS (SELECT range AS j, CAST(10000 AS BIGINT) AS x
       |        FROM range($dims)),
       |$its1,
       |xx AS (SELECT sum(x * x) AS xx FROM xa$iters),
       |gx AS (SELECT gsc.i AS i, sum(gsc.g * v.x) AS gx
       |       FROM gsc JOIN xa$iters v ON v.j = gsc.j GROUP BY 1),
       |lam AS (SELECT sum(CAST(gx.gx AS HUGEINT) * CAST(v.x AS HUGEINT))
       |          AS lam_num
       |        FROM gx JOIN xa$iters v ON v.j = gx.i),
       |g2 AS MATERIALIZED (SELECT gsc.i, gsc.j,
       |              CAST(gsc.g AS HUGEINT) - ${sdiv(
               "lam_num * CAST(xi.x AS HUGEINT) * CAST(xj.x AS HUGEINT)",
               "CAST(xx AS HUGEINT) * CAST(xx AS HUGEINT)")} AS g
       |       FROM gsc JOIN xa$iters xi ON xi.j = gsc.i
       |            JOIN xa$iters xj ON xj.j = gsc.j
       |            CROSS JOIN lam CROSS JOIN xx),
       |xb0 AS (SELECT range AS j, CAST(10000 AS BIGINT) AS x
       |        FROM range($dims)),
       |$its2
       |SELECT CAST(a.j AS BIGINT) AS i, CAST(a.x AS BIGINT) AS x1_e4,
       |       CAST(b.x AS BIGINT) AS x2_e4
       |FROM xa$iters a JOIN xb$iters b ON a.j = b.j""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(

    // ── PCA second component: 8 dims, 3 iterations each side.
    QueryDef("q_pca_deflation",
      (s, d) => Similarity.powerIterationDeflated(
        Similarity.gramMatrix(Tables.embeddings(s, d), 8), 8, 3),
      Some(pcaDeflationSql(8, 3))),

    // ── Simpson reversal: does the discount→quantity trend inside each
    //    brand contradict the pooled trend? Sign-only — no division.
    QueryDef("q_simpson_reversal",
      (s, d) => {
        val dec = "decimal(38,0)"
        val li = Tables.lineitem(s, d)
          .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("g"),
            floor(col("l_discount") * 100 + 0.5).cast(dec).as("x"),
            floor(col("l_quantity") + 0.5).cast(dec).as("y"))
          .localCheckpoint(false) // reused: per-group + pooled moments
        val grp = li.groupBy(col("g"))
          .agg(count(lit(1)).cast(dec).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"))
          .selectExpr("g", "CAST(n AS BIGINT) AS n",
            "CAST(n * sxy - sx * sy AS BIGINT) AS slope_num")
        val pool = li
          .agg(count(lit(1)).cast(dec).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"))
          .selectExpr("CAST(n * sxy - sx * sy AS BIGINT) AS pooled_num")
        grp.crossJoin(broadcast(pool))
          .selectExpr("g", "n", "slope_num", "pooled_num",
            """(slope_num > 0 AND pooled_num < 0) OR
              |(slope_num < 0 AND pooled_num > 0) AS reversal""".stripMargin)
      },
      Some("""WITH li AS (
             |  SELECT p_brand AS g,
             |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x,
             |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS y
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |grp AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
             |               CAST(sum(x) AS HUGEINT) AS sx,
             |               CAST(sum(y) AS HUGEINT) AS sy,
             |               CAST(sum(x * y) AS HUGEINT) AS sxy
             |        FROM li GROUP BY 1),
             |pool AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |                CAST(sum(x) AS HUGEINT) AS sx,
             |                CAST(sum(y) AS HUGEINT) AS sy,
             |                CAST(sum(x * y) AS HUGEINT) AS sxy
             |         FROM li),
             |pn AS (SELECT CAST(n * sxy - sx * sy AS BIGINT) AS pooled_num
             |       FROM pool)
             |SELECT g, CAST(n AS BIGINT) AS n,
             |       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
             |       pooled_num,
             |       (n * sxy - sx * sy > 0 AND pooled_num < 0) OR
             |       (n * sxy - sx * sy < 0 AND pooled_num > 0) AS reversal
             |FROM grp CROSS JOIN pn""".stripMargin)),

    // ── Price elasticity per brand: slope of log₂(qty) on log₂(price)
    //    across parts (fixed-point e6 logs, exact moments).
    QueryDef("q_price_elasticity",
      (s, d) => {
        val dec = "decimal(38,0)"
        val qty = Tables.lineitem(s, d).groupBy(col("l_partkey"))
          .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("q"))
          .where(col("q") > 0)
        val pts = Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"),
            floor(col("p_retailprice") * 100 + 0.5).cast("long").as("pc"))
          .join(qty, col("p_partkey") === col("l_partkey"))
          .select(col("p_brand").as("g"),
            Bm25.log2E6(col("pc")).cast(dec).as("x"),
            Bm25.log2E6(col("q")).cast(dec).as("y"))
        pts.groupBy(col("g"))
          .agg(count(lit(1)).cast(dec).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .selectExpr("g", "CAST(n AS BIGINT) AS n_parts",
            """CASE WHEN n * sxx - sx * sx = 0 THEN NULL
              |     ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) /
              |          CAST(n * sxx - sx * sx AS DOUBLE), 6)
              |END AS elasticity""".stripMargin)
      },
      Some {
        val lgP = Bm25.log2E6Sql("pc")
        val lgQ = Bm25.log2E6Sql("q")
        s"""WITH qty AS (
           |  SELECT l_partkey,
           |         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
           |           AS BIGINT) AS q
           |  FROM lineitem GROUP BY 1 HAVING q > 0),
           |pts AS (
           |  SELECT p_brand AS g, CAST($lgP AS HUGEINT) AS x,
           |         CAST($lgQ AS HUGEINT) AS y
           |  FROM (SELECT p_partkey, p_brand,
           |               CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS pc
           |        FROM part) p
           |  JOIN qty ON p.p_partkey = qty.l_partkey),
           |mo AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
           |              sum(x) AS sx, sum(y) AS sy,
           |              sum(x * y) AS sxy, sum(x * x) AS sxx
           |       FROM pts GROUP BY 1)
           |SELECT g, CAST(n AS BIGINT) AS n_parts,
           |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
           |            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) /
           |                 CAST(n * sxx - sx * sx AS DOUBLE), 6)
           |       END AS elasticity
           |FROM mo""".stripMargin
      })
  )
}
