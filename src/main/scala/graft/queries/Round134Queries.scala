package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-134 batch: data-integrity audits — Luhn checksum validation
  * over synthetic 16-digit account numbers (the check-digit gate an
  * ingest pipeline runs on card/IMEI-like fields; pure div/mod digit
  * arithmetic, no strings), second-digit Benford conformance (the
  * forensic screen q_benford runs on FIRST digits; second digits are
  * the sharper fraud signal because rounding shows up there first),
  * and a per-month table fingerprint (order-count + additive and XOR
  * hashes — the cheap CDC/replication parity check; commutative
  * aggregates, so partition order never matters). All integer-exact.
  */
object Round134Queries {

  /** Luhn sum of the low 16 digits of `c` as a SQL expression: digits at
    * even offsets from the right count once, odd offsets double (−9
    * when the double exceeds 9). Same text runs in Spark and DuckDB. */
  private def luhnSql(c: String): String =
    (0 until 16).map { i =>
      val p = BigInt(10).pow(i)
      val dig = s"(($c) div $p % 10)" // rewritten per dialect below
      if (i % 2 == 0) dig
      else s"(2 * $dig - CASE WHEN $dig >= 5 THEN 9 ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def spark(e: String): String = e
  private def duck(e: String): String = e.replace(" div ", " // ")

  /** Expected second-significant-digit Benford shares, e6
    * (Σ_k log₁₀(1+1/(10k+d)), k=1..9 — literal table). */
  private val benford2 = Seq(119679L, 113890L, 108821L, 104330L,
    100308L, 96677L, 93375L, 90352L, 87570L, 84997L)

  private def benfordCase(d: String): String =
    "CASE " + benford2.indices.map { i =>
      s"WHEN $d = $i THEN ${benford2(i)}"
    }.mkString(" ") + " ELSE 0 END"

  def defs: Seq[QueryDef] = Seq(

    // ── Luhn validity rate of account = o_orderkey·37 + 11 (a spread
    //    that exercises all digit positions), by priority. ONE scan +
    //    the bounded priority rollup; the checksum is branch-free
    //    integer arithmetic inside codegen.
    QueryDef("q_luhn_check",
      (s, d) => {
        val acct = "(o_orderkey * 37 + 11)"
        Tables.orders(s, d)
          .select(col("o_orderpriority"),
            expr(s"${spark(luhnSql(acct))} % 10").as("rem"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("rem") === 0L, 1L).otherwise(0L)).as("n_valid"))
          .selectExpr("o_orderpriority", "CAST(n AS BIGINT) AS n",
            "CAST(n_valid AS BIGINT) AS n_valid",
            "n_valid * 1000000 div n AS valid_e6")
      },
      Some {
        val acct = "(o_orderkey * 37 + 11)"
        s"""WITH t AS (
           |  SELECT o_orderpriority,
           |         ${duck(luhnSql(acct))} % 10 AS rem
           |  FROM orders)
           |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(CASE WHEN rem = 0 THEN 1 ELSE 0 END)
           |         AS BIGINT) AS n_valid,
           |       CAST(sum(CASE WHEN rem = 0 THEN 1 ELSE 0 END)
           |         AS BIGINT) * 1000000 // count(*) AS valid_e6
           |FROM t GROUP BY 1""".stripMargin
      }),

    // ── Second-digit Benford on order totals (cents ≥ 10 so a second
    //    significant digit exists): observed vs expected share e6 and
    //    the absolute deviation, per digit. String-indexed second
    //    digit — identical semantics in both engines.
    QueryDef("q_benford_2nd",
      (s, d) => {
        val cents = Tables.orders(s, d)
          .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("cents"))
          .filter(col("cents") >= 10)
          .select(expr("CAST(substring(CAST(cents AS STRING), 2, 1) " +
            "AS BIGINT)").as("d2"))
        val hist = cents.groupBy(col("d2")).agg(count(lit(1)).as("n"))
          .localCheckpoint(false) // 10-row axis; total below
        val tot = hist.agg(sum(col("n")).as("tot"))
        hist.crossJoin(broadcast(tot))
          .withColumn("obs_e6", expr("n * 1000000 div tot"))
          .withColumn("exp_e6", expr(benfordCase("d2")))
          .selectExpr("d2", "CAST(n AS BIGINT) AS n", "obs_e6", "exp_e6",
            "abs(obs_e6 - exp_e6) AS dev_e6")
      },
      Some(s"""WITH c AS (
             |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100
             |           + 0.5) AS BIGINT) AS VARCHAR), 2, 1) AS BIGINT)
             |           AS d2
             |  FROM orders
             |  WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |          >= 10),
             |hist AS (SELECT d2, CAST(count(*) AS BIGINT) AS n
             |         FROM c GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM hist)
             |SELECT d2, n, n * 1000000 // tot AS obs_e6,
             |       CAST(${benfordCase("d2")} AS BIGINT) AS exp_e6,
             |       abs(n * 1000000 // tot - ${benfordCase("d2")})
             |         AS dev_e6
             |FROM hist CROSS JOIN tot""".stripMargin)),

    // ── Table fingerprint per order month: row count + additive and
    //    XOR hashes of h = (37·key + custkey) mod 1e9+7. Both
    //    aggregates are commutative/associative, so the fingerprint is
    //    partition-order-free — the property a 100 TB replication
    //    check needs.
    QueryDef("q_table_fingerprint",
      (s, d) => {
        Tables.orders(s, d)
          .select(expr("year(o_orderdate) * 100 + month(o_orderdate)")
            .as("mo"),
            expr("(o_orderkey * 37 + o_custkey) % 1000000007").as("h"))
          .groupBy(col("mo"))
          .agg(count(lit(1)).as("n"), sum(col("h")).as("sum_h"),
            expr("bit_xor(h)").as("xor_h"))
          .selectExpr("CAST(mo AS BIGINT) AS mo", "CAST(n AS BIGINT) AS n",
            "CAST(sum_h AS BIGINT) AS sum_h",
            "CAST(xor_h AS BIGINT) AS xor_h")
      },
      Some("""WITH t AS (
             |  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS mo,
             |         (o_orderkey * 37 + o_custkey) % 1000000007 AS h
             |  FROM orders)
             |SELECT CAST(mo AS BIGINT) AS mo,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(h) AS BIGINT) AS sum_h,
             |       CAST(bit_xor(h) AS BIGINT) AS xor_h
             |FROM t GROUP BY 1""".stripMargin))
  )
}
