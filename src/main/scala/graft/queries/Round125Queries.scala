package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-125 batch: three TPC-H-flavored relational shapes the
  * q_tpch_* family didn't yet cover, adapted to the shared schema
  * (no partsupp / receipt dates in the testdata) — supplier variety
  * per part class (Q16's distinct-count-with-exclusion shape), sole-
  * blame attribution on multi-supplier orders (Q21's "only one
  * offender" semantics re-expressed as one keyed aggregation instead
  * of EXISTS/NOT-EXISTS chains — the Spark-native plan), and supply
  * concentration (Q20-adjacent: which suppliers dominate a part's
  * volume). All broadcast the dimension sides.
  */
object Round125Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Supplier variety: distinct suppliers per (brand, size),
    //    excluding "complaint" suppliers (s_name ending in '7' — the
    //    deterministic stand-in for Q16's LIKE filter), top 20 classes.
    //    One lineitem pass; part + the exclusion list broadcast.
    QueryDef("q_supplier_variety",
      (s, d) => {
        val excl = Tables.supplier(s, d)
          .filter(col("s_name").endsWith("7"))
          .select(col("s_suppkey").as("x_suppkey"))
        val li = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"), col("p_size"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(excl),
            col("l_suppkey") === col("x_suppkey"), "left_anti")
        li.groupBy(col("p_brand"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("supplier_cnt").desc, col("p_brand"),
              col("p_size"))))
          .filter(col("rk") <= 20)
          .selectExpr("p_brand", "CAST(p_size AS BIGINT) AS p_size",
            "CAST(supplier_cnt AS BIGINT) AS supplier_cnt",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH li AS (
             |  SELECT l.l_suppkey, p.p_brand, p.p_size
             |  FROM lineitem l
             |  JOIN part p ON l.l_partkey = p.p_partkey
             |  WHERE l.l_suppkey NOT IN (
             |    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')),
             |cls AS (SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
             |               CAST(count(DISTINCT l_suppkey) AS BIGINT)
             |                 AS supplier_cnt
             |        FROM li GROUP BY 1, 2)
             |SELECT p_brand, p_size, supplier_cnt, rk
             |FROM (SELECT *, CAST(row_number() OVER (ORDER BY
             |        supplier_cnt DESC, p_brand, p_size) AS BIGINT) AS rk
             |      FROM cls)
             |WHERE rk <= 20""".stripMargin)),

    // ── Sole blame (Q21 semantics, aggregation form): on orders with
    //    ≥2 distinct suppliers where EXACTLY ONE supplier has returned
    //    lines, charge that supplier. One (order, supplier) rollup +
    //    one order rollup + the blame join — three keyed exchanges vs
    //    Q21's four-way EXISTS chain; identical result set.
    QueryDef("q_sole_blame",
      (s, d) => {
        val os = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("ret"))
          .localCheckpoint(false) // order rollup + blame leg
        val ord = os.groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_supp"), sum(col("ret")).as("n_ret"))
          .filter(col("n_supp") >= 2 && col("n_ret") === 1)
        os.filter(col("ret") === 1L)
          .join(ord, "l_orderkey")
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("numwait"))
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("numwait").desc, col("s_name"))))
          .filter(col("rk") <= 10)
          .selectExpr("s_name", "CAST(numwait AS BIGINT) AS numwait",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH os AS (
             |  SELECT l_orderkey, l_suppkey,
             |         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
             |             END) AS ret
             |  FROM lineitem GROUP BY 1, 2),
             |ord AS (SELECT l_orderkey
             |        FROM os GROUP BY 1
             |        HAVING count(*) >= 2 AND sum(ret) = 1),
             |blame AS (SELECT os.l_suppkey,
             |                 CAST(count(*) AS BIGINT) AS numwait
             |          FROM os JOIN ord ON os.l_orderkey = ord.l_orderkey
             |          WHERE os.ret = 1
             |          GROUP BY 1)
             |SELECT s_name, numwait, rk
             |FROM (SELECT s.s_name, b.numwait,
             |             CAST(row_number() OVER (ORDER BY b.numwait DESC,
             |               s.s_name) AS BIGINT) AS rk
             |      FROM blame b JOIN supplier s
             |        ON b.l_suppkey = s.s_suppkey)
             |WHERE rk <= 10""".stripMargin)),

    // ── Supply concentration: per part, the 1997 volume share of its
    //    top supplier (exact e6 on integer quantities); parts above 50%
    //    roll up to the dominating supplier — who controls the most
    //    part markets. One (part, supplier) rollup; window on the part
    //    key reuses the same partitioning.
    QueryDef("q_supply_concentration",
      (s, d) => {
        val ps = Tables.lineitem(s, d)
          .filter(expr("year(l_shipdate) = 1997"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity").cast("long")).as("q"))
        val shared = ps
          .withColumn("tot", sum(col("q")).over(
            Window.partitionBy(col("l_partkey"))))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("l_partkey"))
              .orderBy(col("q").desc, col("l_suppkey"))))
          .filter(col("rk") === 1)
          .withColumn("share_e6", expr("q * 1000000 div tot"))
          .filter(col("share_e6") > 500000L)
        shared.groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n_dominated"),
            sum(col("q")).as("q_dominated"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("n_dominated").desc, col("l_suppkey"))))
          .filter(col("rk") <= 10)
          .selectExpr("l_suppkey AS suppkey",
            "CAST(n_dominated AS BIGINT) AS n_dominated",
            "CAST(q_dominated AS BIGINT) AS q_dominated",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH ps AS (
             |  SELECT l_partkey, l_suppkey,
             |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
             |           AS q
             |  FROM lineitem WHERE year(l_shipdate) = 1997
             |  GROUP BY 1, 2),
             |sh AS (SELECT l_partkey, l_suppkey, q,
             |              CAST(sum(q) OVER (PARTITION BY l_partkey)
             |                AS BIGINT) AS tot,
             |              row_number() OVER (PARTITION BY l_partkey
             |                ORDER BY q DESC, l_suppkey) AS rk
             |       FROM ps),
             |dom AS (SELECT l_suppkey,
             |               CAST(count(*) AS BIGINT) AS n_dominated,
             |               CAST(sum(q) AS BIGINT) AS q_dominated
             |        FROM sh
             |        WHERE rk = 1 AND q * 1000000 // tot > 500000
             |        GROUP BY 1)
             |SELECT l_suppkey AS suppkey, n_dominated, q_dominated, rk
             |FROM (SELECT *, CAST(row_number() OVER (ORDER BY n_dominated
             |        DESC, l_suppkey) AS BIGINT) AS rk
             |      FROM dom)
             |WHERE rk <= 10""".stripMargin))
  )
}
