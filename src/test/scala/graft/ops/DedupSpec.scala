package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("text"))

  test("exact dedup collapses injected exact copies to the original id") {
    val aug = docs.unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val out = Dedup.exact(aug)
    // every duplicated text keeps the ORIGINAL (smaller) id
    assert(out.filter(col("dup_cnt") === 2).count() == docs.filter(col("doc_id") % 10 === 0).count())
    assert(out.filter(col("keep_doc_id") >= 1000000L).count() == 0)
    // dedup result row count == distinct texts
    assert(out.count() == aug.select("text").distinct().count())
  }

  test("minhash LSH finds injected near-duplicates (recall on tail-edited copies)") {
    val nearIds = docs.filter(col("doc_id") % 7 === 0).select("doc_id").as[Long].collect().toSet
    val aug = docs.unionByName(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" graft extra tail")).as("text")))
    val cand = Dedup.candidates(Dedup.minhash(Dedup.shingles(aug))).collect()
    val found = cand.collect {
      case r if r.getAs[Long]("doc_b") == r.getAs[Long]("doc_a") + 1000000L => r.getAs[Long]("doc_a")
    }.toSet
    // near-dup pairs differ by a 3-word tail → high minhash similarity;
    // LSH with 4 bands of 2 should recover the large majority
    assert(found.size >= (nearIds.size * 0.8).toInt,
      s"found ${found.size} of ${nearIds.size} injected near-dups")
    // and those pairs should show high estimated similarity
    val eqs = cand.collect {
      case r if r.getAs[Long]("doc_b") == r.getAs[Long]("doc_a") + 1000000L => r.getAs[Long]("n_eq")
    }
    assert(eqs.nonEmpty && eqs.sum.toDouble / (eqs.length * 8) > 0.6)
  }

  test("simhash: near-identical docs have near-identical fingerprints") {
    val base = Seq((1L, "spark window join filter merge sort table scan batch stream"),
                   (2L, "spark window join filter merge sort table scan batch streaming"),
                   (3L, "completely different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val fp = Dedup.simhash(base).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(2L)) < hamming(fp(1L), fp(3L)),
      s"fp=${fp}")
  }

  test("jaccard pairs: identical docs score 1.0, disjoint score absent") {
    val d = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val out = Dedup.jaccardPairs(d).collect()
    assert(out.length == 1) // only (1,2) intersect
    val r = out.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Double]("jacc") == 1.0)
  }
}
