package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class Round50OpsSpec extends SparkSpec {
  import spark.implicits._

  test("bowtie: classifies a hand-built core/in/out/other graph") {
    // core: 1↔2 (2-cycle); in: 0→1; out: 2→3; other: 9 (isolated)
    val nodes = Seq(0L, 1L, 2L, 3L, 9L).toDF("id")
      .withColumn("is_seed", org.apache.spark.sql.functions.col("id") === 1L)
    val edges = Seq((1L, 2L), (2L, 1L), (0L, 1L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.bowtie(nodes, edges, "is_seed", 8).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("core" -> 2L, "in" -> 1L, "out" -> 1L, "other" -> 1L))
  }

  test("bowtie: a pure cycle is all core") {
    val nodes = Seq(0L, 1L, 2L).toDF("id")
      .withColumn("is_seed", org.apache.spark.sql.functions.col("id") === 0L)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val r = Graph.bowtie(nodes, edges, "is_seed", 8).collect()
    assert(r.length === 1)
    assert(r.head.getString(0) === "core")
    assert(r.head.getLong(1) === 3L)
  }

  test("klVocab: identical splits diverge ~0, disjoint splits diverge a lot") {
    val same = (Seq.fill(20)((0L, "a")) ++ Seq.fill(20)((1L, "a")) ++
      Seq.fill(10)((0L, "b")) ++ Seq.fill(10)((1L, "b")))
      .toDF("split", "word")
    val Row(v: Long, na: Long, nb: Long, ab: Long, ba: Long) =
      TextAnalysis.klVocab(same).collect().head
    assert(v === 2L && na === 30L && nb === 30L)
    assert(ab < 2000L && ba < 2000L) // ≈0 bits (truncation residue only)

    val disj = (Seq.fill(30)((0L, "x")) ++ Seq.fill(30)((1L, "y")))
      .toDF("split", "word")
    val r = TextAnalysis.klVocab(disj).collect().head
    assert(r.getLong(3) > 2000000L) // > 2 bits each way
    assert(r.getLong(4) > 2000000L)
  }

  test("klVocab: asymmetry — a split missing mass diverges differently") {
    // A says 'a' 31 of 32 tokens; B uniform over a,b.
    val df = (Seq.fill(31)((0L, "a")) ++ Seq.fill(1)((0L, "b")) ++
      Seq.fill(16)((1L, "a")) ++ Seq.fill(16)((1L, "b")))
      .toDF("split", "word")
    val Row(_, _, _, ab: Long, ba: Long) =
      TextAnalysis.klVocab(df).collect().head
    assert(ab > 0L && ba > 0L && ab != ba)
  }
}
