package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf()).limit(50)

  test("binary payload plumbing: schema and byte counts") {
    val df = Multimodal.attachPayload(docs)
    assert(df.schema("payload").dataType.typeName == "binary")
    // UTF-8 payload of ASCII text: bytes == chars
    val r = df.select(octet_length(col("payload")).cast("long") === col("n_chars")).collect()
    assert(r.forall(_.getBoolean(0)))
  }

  test("partition-wise decode (FakeDecoder) agrees with the declarative meta path") {
    val withPayload = Multimodal.attachPayload(docs)
    val declarative = Multimodal.extractMeta(withPayload)
      .select(col("doc_id"), col("n_bytes"), col("meta.width"), col("meta.height"))
    val imperative = Multimodal.decodePartitions(withPayload, Multimodal.FakeDecoder)
      .select(col("doc_id"), col("n_bytes").cast("long"), col("width"), col("height"))
    assert(declarative.exceptAll(imperative).isEmpty &&
      imperative.exceptAll(declarative).isEmpty)
  }

  test("real decoder seam is explicit about unavailability") {
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodePartitions(Multimodal.attachPayload(docs),
        Multimodal.RealDecoder).collect()
    }
    assert(e.getCause.isInstanceOf[UnsupportedOperationException] ||
      e.getMessage.contains("media codecs"))
  }

  test("language-id heuristic: docs containing only 'der die das' predict de") {
    import spark.implicits._
    val d = Seq((1L, "der die das und ist", "de"),
                (2L, "the a of and to", "en"),
                (3L, "xyzzy plugh", "zz")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(d).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "de" && out(2L) == "en" && out(3L) == "unknown")
  }
}
