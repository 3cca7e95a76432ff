package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round30OpsSpec extends SparkSpec {
  import spark.implicits._

  // ── Curation.chunk ───────────────────────────────────────────────────

  test("chunk: overlap windows cover the doc; trailing partial kept") {
    // 7 tokens, width 3, stride 2 → starts 1,3,5,7: lens 3,3,3,1.
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Curation.chunk(docs, width = 3, stride = 2)
      .select("chunk_id", "n_tok").as[(Long, Long)].collect().sorted
    assert(got.toSeq === Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 1L)))
  }

  test("chunk: digest matches the joined token slice") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val got = Curation.chunk(docs, width = 2, stride = 2)
      .orderBy("chunk_id")
      .select("chunk_md5").as[String].collect()
    val exp = Seq("x y", "z").map(s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(got.toSeq === exp)
  }

  test("chunk: doc shorter than one window yields one partial chunk") {
    val docs = Seq((1L, "only two")).toDF("doc_id", "text")
    val got = Curation.chunk(docs, width = 40, stride = 30)
      .select("chunk_id", "n_tok").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((0L, 2L)))
  }

  // ── TextAnalysis.linearScore ─────────────────────────────────────────

  test("linearScore: margin is the sum of bucket weights with multiplicity") {
    // One doc with a repeated token: margin must be 3 × the token weight.
    val single = Seq((1L, "tok")).toDF("doc_id", "text")
    val w1 = TextAnalysis.linearScore(single, 256, 10)
      .select("margin").as[Long].head()
    val tripled = Seq((1L, "tok tok tok")).toDF("doc_id", "text")
    val got = TextAnalysis.linearScore(tripled, 256, 10)
      .select("n_tok", "margin").as[(Long, Long)].head()
    assert(got === ((3L, 3L * w1)))
  }

  test("linearScore: top-k ordering is (margin desc, doc_id)") {
    val docs = Seq((1L, "a a"), (2L, "a"), (3L, "a a")).toDF("doc_id", "text")
    val got = TextAnalysis.linearScore(docs, 256, 3)
      .select("doc_id").as[Long].collect()
    val wA = TextAnalysis.linearScore(Seq((9L, "a")).toDF("doc_id", "text"),
      256, 1).select("margin").as[Long].head()
    // Doubled docs lead if weight > 0, trail if < 0; ties break by id.
    if (wA > 0) assert(got.toSeq === Seq(1L, 3L, 2L))
    else if (wA < 0) assert(got.toSeq === Seq(2L, 1L, 3L))
    else assert(got.toSeq === Seq(1L, 2L, 3L))
  }
}
