package graft.ops

import graft.SparkSpec

class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("retrievalMetrics: precision counts, MRR from the first hit") {
    val df = Seq(
      ("q1", 1L, 0L), ("q1", 2L, 1L), ("q1", 3L, 0L), ("q1", 4L, 2L),
      ("q2", 1L, 0L), ("q2", 2L, 0L)
    ).toDF("g", "rank", "rel")
    val got = Ranking.retrievalMetrics(df, "g", "rank", "rel", 3)
      .select("g", "n_rel_at_k", "first_rel_rank", "prec_e6", "mrr_e6")
      .as[(String, Long, Option[Long], Long, Option[Long])].collect().toSet
    assert(got === Set(
      ("q1", 1L, Some(2L), 333333L, Some(500000L)),
      ("q2", 0L, None, 0L, None)))
  }

  test("maintainMinMax: touching delete rebuilds; insert extends cheaply") {
    val base = Seq(("x", 10L, 90L), ("y", 5L, 6L)).toDF("g", "mn", "mx")
    val changes = Seq(
      ("x", 90L, -1L),  // delete the max -> rebuild x
      ("x", 95L, 1L),   // insert (also lands in rebuild's raw)
      ("y", 1L, 1L),    // non-touching insert -> fast path min
      ("z", 42L, 1L)    // brand-new group
    ).toDF("g", "v", "op")
    // raw = post-change truth for x; y/z untouched by deletes
    val raw = Seq(("x", 10L), ("x", 40L), ("x", 95L),
      ("y", 5L), ("y", 6L), ("y", 1L), ("z", 42L)).toDF("g", "v")
    val got = Incremental.maintainMinMax(base, changes, raw)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("x", 10L, 95L), ("y", 1L, 6L), ("z", 42L, 42L)))
  }

  test("maintainMinMax: group emptied by deletes vanishes") {
    val base = Seq(("x", 7L, 7L)).toDF("g", "mn", "mx")
    val changes = Seq(("x", 7L, -1L)).toDF("g", "v", "op")
    val raw = Seq.empty[(String, Long)].toDF("g", "v")
    assert(Incremental.maintainMinMax(base, changes, raw).isEmpty)
  }

  test("maintainKmv: sketch-horizon deletes rebuild, beyond-horizon are free") {
    import org.apache.spark.sql.functions._
    val k = 4
    def h(v: Long) = Dedup.hash48(lit(v.toString), lit("kmv"))
    // base group "a" over values 1..10: sketch = 4 smallest hashes
    val vals = (1L to 10L)
    val hashed = vals.map(v => v -> spark.range(1).select(h(v)).head().getLong(0)).toMap
    val sorted = vals.sortBy(hashed)
    val base = spark.range(1).select(lit("a").as("g"),
      array(sorted.take(k).map(v => lit(hashed(v))): _*).as("sketch"))
    // delete the value holding the sketch's minimum -> rebuild from raw
    val victim = sorted.head
    val changes = Seq(("a", victim, -1L)).toDF("g", "v", "op")
    val raw = vals.filterNot(_ == victim).map(("a", _)).toDF("g", "v")
    val got = Incremental.maintainKmv(base, changes, raw, k)
      .select("g", "sketch").as[(String, Seq[Long])].collect().head
    assert(got._2 === sorted.tail.take(k).map(hashed).sorted)
    // delete a value OUTSIDE the sketch horizon: fast path, raw poisoned
    val outside = sorted.last
    val changes2 = Seq(("a", outside, -1L)).toDF("g", "v", "op")
    val poisoned = Seq(("a", 999L)).toDF("g", "v")
    val got2 = Incremental.maintainKmv(base, changes2, poisoned, k)
      .select("g", "sketch").as[(String, Seq[Long])].collect().head
    assert(got2._2 === sorted.take(k).map(hashed))
  }

  test("maintainKmv: unsaturated sketch estimates exactly") {
    val base = Seq(("a", Seq.empty[Long])).toDF("g", "sketch")
    val changes = Seq(("a", 1L, 1L), ("a", 2L, 1L)).toDF("g", "v", "op")
    val raw = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    val got = Incremental.maintainKmv(base, changes, raw, 64)
      .select("g", "est").as[(String, Long)].collect().head
    assert(got === (("a", 2L)))
  }

  test("maintainMinMax: non-touching delete leaves extremes untouched") {
    val base = Seq(("x", 1L, 9L)).toDF("g", "mn", "mx")
    val changes = Seq(("x", 5L, -1L)).toDF("g", "v", "op")
    // raw deliberately poisoned: a correct fast path must NOT read it
    val raw = Seq(("x", 777L)).toDF("g", "v")
    val got = Incremental.maintainMinMax(base, changes, raw)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("x", 1L, 9L)))
  }
}
