package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {

  test("splitAssign: deterministic, complete, roughly 90/5/5") {
    import spark.implicits._
    val ids = (1 to 10000).map(_.toLong).toDF("id")
    val out = ids.groupBy(Curation.splitAssign($"id".cast("string")).as("s")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum === 10000L)
    assert(out("train") > 8800 && out("train") < 9200)
    assert(out("val") > 350 && out("val") < 650)
    assert(out("test") > 350 && out("test") < 650)
    // determinism: same assignment on re-run
    val out2 = ids.groupBy(Curation.splitAssign($"id".cast("string")).as("s")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === out2)
  }

  test("packSequences: bins respect the running-prefix rule; oversized doc overflows alone") {
    import spark.implicits._
    // one shard (nShards=1): docs of 100 tokens, one 900-token doc in the middle
    val docs = Seq((1L, 100L), (2L, 100L), (3L, 900L), (4L, 100L), (5L, 100L))
      .toDF("doc_id", "n_tokens")
    val out = Curation.packSequences(docs, "doc_id", "n_tokens", 256, 1)
      .select("doc_id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // prefixes before each doc: 0,100,200,1100,1200 → bins 0,0,0,4,4
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L, 5L -> 4L))
  }

  test("fillGaps: dense spine per key, zero counts, forward-filled averages") {
    import spark.implicits._
    val r = Seq(
      ("a", 0L, 2L, 100000L), ("a", 900L, 1L, 300000L),  // gap at 300, 600
      ("b", 300L, 1L, 50000L))
      .toDF("k", "bucket_es", "cnt", "avg_e4")
    val filled = TimeSeries.fillGaps(r, "k", 300L)
      .orderBy($"k", $"bucket_es")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(filled.toSeq === Seq(
      ("a", 0L, 2L, 100000L), ("a", 300L, 0L, 100000L), ("a", 600L, 0L, 100000L),
      ("a", 900L, 1L, 300000L), ("b", 300L, 1L, 50000L)))
  }

  test("resample average is integral and exact (no half-way rounding trap)") {
    import spark.implicits._
    // avg of 29.05 and 28.2125... values constructed so a double avg would
    // land on .00005: 28.6313 vs 28.6312 across engines; integer path is exact
    val df = Seq((1L, "2024-01-01T00:00:10Z", 28.21), (1L, "2024-01-01T00:01:10Z", 29.05))
      .toDF("k", "ts_s", "v").withColumn("ts", to_timestamp($"ts_s"))
    val out = TimeSeries.resample(df, "k", "ts", "v").collect().head
    // cents: 2821 + 2905 = 5726 → avg_e4 = 5726*100 div 2 = 286300
    assert(out.getAs[Long]("avg_e4") === 286300L)
  }

  test("contamination counts distinct shared shingles only") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 2 shingles
      (2L, "zeta eta theta iota"),            // shares 0
      (3L, "alpha beta gamma alpha beta gamma")).toDF("doc_id", "text") // dup shingles count once
    val out = Curation.contamination(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 3 repeats 'alpha beta gamma' — shared DISTINCT shingles = 1
    assert(out === Map(1L -> 2L, 3L -> 1L))
  }
}
