package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-167 batch — a linear-sketch estimator, a data-profiling audit,
  * and the f-divergence companions to q_kl_vocab / q_js_source:
  *
  *  - AMS F2 sketch (`q_ams_f2`): Alon–Matias–Szegedy tug-of-war
  *    estimate of the second frequency moment (self-join size) of
  *    l_partkey. Eight ±1 counters from md5-derived 4-wise-ish signs,
  *    computed as EIGHT sum(CASE) columns in ONE aggregate — a single
  *    map-side-combinable pass, no explode, no shuffle on the key. The
  *    exact F2 (one partkey groupBy) rides along as the audit column —
  *    at 100 TB only the sketch pass survives; the exact side is the
  *    oracle's cross-check. Signs via md5 first hex digit < '8' — the
  *    same portable-hash trick the MinHash/SimHash family uses.
  *  - FD audit (`q_fd_audit`): approximate functional-dependency
  *    profiling — for each candidate LHS→RHS, the distinct-LHS count,
  *    violating-LHS count, and Kivinen–Mannila g3 (min rows to delete
  *    for the FD to hold = Σ_lhs (n_lhs − max_rhs n)). One exact FD
  *    (partkey→brand through the broadcast part dim) pins g3=0; two
  *    violated FDs measure real dependency strength. Two keyed aggs
  *    per FD, partial+final all the way.
  *  - Hellinger + total-variation (`q_hellinger_tv`): per source pair,
  *    TV = ½Σ|p−q| and the Bhattacharyya coefficient Σ√(p·q) over the
  *    5-language distribution, Hellinger² = 1 − BC. Probabilities are
  *    e6 integers; √(p_e6·q_e6) is a PER-ELEMENT scalar (portable)
  *    rounded to an integer BEFORE the cross-row sum — the only way a
  *    multi-term irrational sum is engine-deterministic. Dense
  *    source×lang grid built by a bounded cross join so absent
  *    languages contribute their full one-sided mass.
  */
object Round167Queries {

  /** ±1 sign for counter j from the md5 of the key: first hex digit in
    * 0-7 → +1 (top nibble bit clear), else −1. Identical text both
    * engines. */
  private def signSql(key: String, j: Int): String =
    s"CASE WHEN substring(md5(concat(CAST($key AS STRING), '_$j')), 1, 1)" +
      s" IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END"

  private def signDuck(key: String, j: Int): String =
    s"CASE WHEN substring(md5(concat(CAST($key AS VARCHAR), '_$j')), 1, 1)" +
      s" IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END"

  def defs: Seq[QueryDef] = Seq(

    // ── AMS F2: 8 counters in one agg; estimate = mean of c_j².
    QueryDef("q_ams_f2",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_partkey").as("pk"))
        val sk = li.agg(count(lit(1)).as("n"),
          (0 until 8).map(j =>
            sum(expr(signSql("pk", j))).as(s"c$j")): _*)
        val exact = li.groupBy(col("pk")).agg(count(lit(1)).as("f"))
          .agg(count(lit(1)).as("dk"), sum(expr("f * f")).as("f2"))
        val sq = (0 until 8).map(j => s"c$j * c$j").mkString(" + ")
        sk.crossJoin(broadcast(exact))
          .selectExpr("n", "dk AS distinct_keys", "f2 AS f2_exact",
            s"($sq) div 8 AS f2_est")
          .selectExpr("n", "distinct_keys", "f2_exact", "f2_est",
            "abs(f2_est - f2_exact) * 1000000 div f2_exact AS abs_err_e6",
            "CASE WHEN f2_est >= f2_exact THEN 'OVER' ELSE 'UNDER' END" +
              " AS side")
      },
      Some {
        val cs = (0 until 8).map(j =>
          s"CAST(sum(${signDuck("l_partkey", j)}) AS BIGINT) AS c$j")
          .mkString(", ")
        val sq = (0 until 8).map(j => s"c$j * c$j").mkString(" + ")
        s"""WITH sk AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n, $cs FROM lineitem),
           |ex AS (SELECT CAST(count(*) AS BIGINT) AS dk,
           |              CAST(sum(f * f) AS BIGINT) AS f2
           |       FROM (SELECT CAST(count(*) AS BIGINT) AS f
           |             FROM lineitem GROUP BY l_partkey)),
           |est AS (SELECT n, dk, f2, ($sq) // 8 AS f2_est
           |        FROM sk CROSS JOIN ex)
           |SELECT n, dk AS distinct_keys, f2 AS f2_exact, f2_est,
           |       abs(f2_est - f2) * 1000000 // f2 AS abs_err_e6,
           |       CASE WHEN f2_est >= f2 THEN 'OVER' ELSE 'UNDER' END
           |         AS side
           |FROM est""".stripMargin
      }),

    // ── FD audit: g3 per candidate dependency.
    QueryDef("q_fd_audit",
      (s, d) => {
        def audit(df: org.apache.spark.sql.DataFrame, fd: String) = df
          .groupBy(col("lhs"), col("rhs")).agg(count(lit(1)).as("c"))
          .groupBy(col("lhs"))
          .agg(sum(col("c")).as("tot"), max(col("c")).as("mx"),
            count(lit(1)).as("nrhs"))
          .agg(count(lit(1)).as("lhs_distinct"),
            sum(expr("CASE WHEN nrhs > 1 THEN 1 ELSE 0 END"))
              .as("violating_lhs"),
            sum(col("tot")).as("n_rows"), sum(expr("tot - mx")).as("g3"))
          .selectExpr(s"'$fd' AS fd", "lhs_distinct", "violating_lhs",
            "n_rows", "g3", "g3 * 1000000 div n_rows AS g3_e6")
        val li = Tables.lineitem(s, d)
        val withBrand = li.join(
          broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        audit(withBrand.select(col("l_partkey").as("lhs"),
            col("p_brand").as("rhs")), "partkey->brand")
          .unionByName(audit(li.select(col("l_orderkey").as("lhs"),
            col("l_suppkey").as("rhs")), "orderkey->suppkey"))
          .unionByName(audit(li.select(col("l_partkey").as("lhs"),
            col("l_suppkey").as("rhs")), "partkey->suppkey"))
      },
      Some {
        def block(lhsSel: String, fd: String, from: String) =
          s"""SELECT '$fd' AS fd,
             |       CAST(count(*) AS BIGINT) AS lhs_distinct,
             |       CAST(sum(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END)
             |         AS BIGINT) AS violating_lhs,
             |       CAST(sum(tot) AS BIGINT) AS n_rows,
             |       CAST(sum(tot - mx) AS BIGINT) AS g3,
             |       CAST(sum(tot - mx) AS BIGINT) * 1000000
             |         // CAST(sum(tot) AS BIGINT) AS g3_e6
             |FROM (SELECT lhs, sum(c) AS tot, max(c) AS mx,
             |             count(*) AS nrhs
             |      FROM (SELECT $lhsSel, CAST(count(*) AS BIGINT) AS c
             |            FROM $from GROUP BY 1, 2)
             |      GROUP BY 1)""".stripMargin
        block("l_partkey AS lhs, p_brand AS rhs", "partkey->brand",
          "lineitem JOIN part ON p_partkey = l_partkey") +
          "\nUNION ALL\n" +
          block("l_orderkey AS lhs, l_suppkey AS rhs",
            "orderkey->suppkey", "lineitem") +
          "\nUNION ALL\n" +
          block("l_partkey AS lhs, l_suppkey AS rhs",
            "partkey->suppkey", "lineitem")
      }),

    // ── Hellinger² + TV per source pair over language distributions.
    QueryDef("q_hellinger_tv",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val counts = docs.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // grid fill + totals
        val tots = counts.groupBy(col("source")).agg(sum(col("c")).as("t"))
        val grid = counts.select(col("source")).distinct()
          .crossJoin(counts.select(col("lang")).distinct())
        val probs = grid
          .join(counts, Seq("source", "lang"), "left")
          .join(tots, "source")
          .selectExpr("source", "lang",
            "coalesce(c, 0L) * 1000000 div t AS p")
          .localCheckpoint(false) // both sides of the pair join
        probs.select(col("source").as("s1"), col("lang"),
            col("p").as("p1"))
          .join(probs.select(col("source").as("s2"), col("lang"),
            col("p").as("p2")), "lang")
          .where(col("s1") < col("s2"))
          .groupBy(col("s1"), col("s2"))
          .agg(sum(expr("abs(p1 - p2)")).as("stv"),
            sum(expr("CAST(round(sqrt(CAST(p1 * p2 AS DOUBLE)))" +
              " AS BIGINT)")).as("bc_e6"))
          .selectExpr("s1", "s2", "stv div 2 AS tv_e6", "bc_e6",
            "1000000 - bc_e6 AS h2_e6")
      },
      Some("""WITH counts AS (
             |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
             |  FROM documents GROUP BY 1, 2),
             |tots AS (SELECT source, CAST(sum(c) AS BIGINT) AS t
             |         FROM counts GROUP BY 1),
             |grid AS (SELECT a.source AS source, b.lang AS lang
             |         FROM (SELECT DISTINCT source FROM counts) a
             |         CROSS JOIN (SELECT DISTINCT lang FROM counts) b),
             |probs AS (SELECT g.source, g.lang,
             |            coalesce(c.c, 0) * 1000000 // t.t AS p
             |          FROM grid g
             |          LEFT JOIN counts c ON c.source = g.source
             |            AND c.lang = g.lang
             |          JOIN tots t ON t.source = g.source)
             |SELECT a.source AS s1, b.source AS s2,
             |       CAST(sum(abs(a.p - b.p)) // 2 AS BIGINT) AS tv_e6,
             |       CAST(sum(CAST(round(sqrt(CAST(a.p * b.p AS DOUBLE)))
             |         AS BIGINT)) AS BIGINT) AS bc_e6,
             |       1000000 - CAST(sum(CAST(round(sqrt(
             |         CAST(a.p * b.p AS DOUBLE))) AS BIGINT)) AS BIGINT)
             |         AS h2_e6
             |FROM probs a JOIN probs b ON b.lang = a.lang
             |  AND a.source < b.source
             |GROUP BY 1, 2""".stripMargin))
  )
}
