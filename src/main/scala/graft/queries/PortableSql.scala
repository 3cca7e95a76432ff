package graft.queries

/** SQL fragments reproducing graft's portable hashing in any ANSI engine
  * (the DuckDB oracle side of [[graft.ops.Dedup]]). */
object PortableSql {

  /** Closed-form parse of the first `n` hex chars of `hexExpr` as a
    * BIGINT — the oracle twin of Spark's `conv(substring(md5 …), 16, 10)`.
    * (DuckDB has no conv/strtol; a strpos polynomial is exact.) */
  def hexToLong(hexExpr: String, n: Int = 12): String =
    "(" + (1 to n).map { i =>
      s"(strpos('0123456789abcdef', substr($hexExpr, $i, 1)) - 1) * ${BigInt(16).pow(n - i)}"
    }.mkString(" + ") + ")"

  /** 48-bit salted string hash (twin of Dedup.hash48). */
  def hash48(expr: String, saltExpr: String): String =
    hexToLong(s"md5(concat($saltExpr, '|', $expr))")

  /** Parse 8 hex chars of `hexExpr` starting at 1-based offset
    * `offsetExpr + 1` as BIGINT (twin of Dedup.minhash's digest slicing). */
  def hexSliceToLong(hexExpr: String, offsetExpr: String): String =
    "(" + (1 to 8).map { i =>
      s"(strpos('0123456789abcdef', substr($hexExpr, ($offsetExpr) + $i, 1)) - 1) * ${BigInt(16).pow(8 - i)}"
    }.mkString(" + ") + ")"
}
