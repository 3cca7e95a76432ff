package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata, exactly as a 100 TB curation pipeline
  * carries them (decode happens late, next to the consumer, never in the
  * shuffle path).
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is stubbed behind [[MultimodalDecoder]]: the Spark-side
  * plumbing — schema, binary payloads, batched partition-wise decode shape,
  * metadata struct — is real and tested; the codec body is a deterministic
  * fake (or throws, for the real seam).
  */
object Multimodal {

  /** Decoder seam. A production impl wraps an actual codec (e.g. JNI
    * image lib) and is called once per partition over batched payloads —
    * the Spark shape (mapPartitions, lazy iterator, no per-row setup cost)
    * is what matters at scale. */
  trait MultimodalDecoder extends Serializable {
    def decodeDims(payload: Array[Byte]): (Int, Int)
  }

  /** Deterministic fake codec: dims derived from payload length. */
  object FakeDecoder extends MultimodalDecoder {
    def decodeDims(p: Array[Byte]): (Int, Int) =
      (64 + (p.length * 7) % 192, 64 + (p.length * 13) % 192)
  }

  /** Real-codec placeholder: intentionally unimplemented offline. */
  object RealDecoder extends MultimodalDecoder {
    def decodeDims(p: Array[Byte]): (Int, Int) =
      throw new UnsupportedOperationException(
        "media codecs are not available in this environment; use FakeDecoder")
  }

  /** Attach an opaque binary payload + mime metadata to documents (the
    * corpus ships no real media; UTF-8 bytes stand in — the column type
    * and everything downstream is the real shape). */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("mime", concat(lit("bin/"), col("source")))

  /** Declarative metadata extraction (codegen path): byte size + fake
    * decoded dims via exact integer arithmetic. */
  def extractMeta(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("meta", struct(
        col("mime").as("mime"),
        (lit(64) + col("n_bytes") * 7 % 192).cast("int").as("width"),
        (lit(64) + col("n_bytes") * 13 % 192).cast("int").as("height")))

  /** Partition-batched feature extraction over raw payload bytes: an
    * 8-bucket byte histogram per payload (bucket = byte % 8) — the same
    * mapPartitions shape a real embedding/feature model runs in (batch the
    * partition through the model, emit fixed-width features), with a
    * deterministic integer featurizer standing in for the model so the
    * whole path is oracle-checkable. */
  def featurizePartitions(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, p) =>
        val f = new Array[Long](8)
        p.foreach(b => f((b & 0xff) % 8) += 1)
        (id, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
      }
    }.toDF("doc_id", "f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7")
  }

  /** Resize stub: deterministic byte-stride downsample — every `stride`-th
    * byte of the payload survives. A real image resize replaces the loop
    * body; the partition-batched shape, the binary-in/binary-out schema,
    * and the size law (⌈n/stride⌉) are the production contract. */
  def resizePartitions(df: DataFrame, stride: Int = 4): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, p) =>
        val r = Array.tabulate((p.length + stride - 1) / stride)(i => p(i * stride))
        (id, p.length.toLong, r.length.toLong, r)
      }
    }.toDF("doc_id", "n_bytes", "resized_bytes", "resized")
  }

  /** Frame sampling: view the payload as fixed `frameSize`-byte frames
    * (a stand-in for video GOPs / audio windows), keep every `every`-th
    * frame. Fully declarative — the frame slice is a codegen'd binary
    * `substring`, the explode is map-side — so Catalyst prunes and
    * pushes around it like any other column op; no decode required to
    * SELECT which frames ship to the decoder (the point of
    * sample-before-decode at 100 TB). */
  def sampleFrames(df: DataFrame, frameSize: Int = 256, every: Int = 2): DataFrame =
    df.select(col("doc_id"), col("payload"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("n_frames", expr(s"(n_bytes + ${frameSize - 1}) div $frameSize"))
      .withColumn("frame_idx", explode(expr("sequence(0, n_frames - 1)")))
      .filter(col("frame_idx") % every === 0)
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameSize + 1, $frameSize)").as("frame"))
      .withColumn("frame_bytes", octet_length(col("frame")).cast("long"))

  /** Imperative decode seam: batched partition-wise decode through a
    * [[MultimodalDecoder]] — the shape a real codec plugs into. */
  def decodePartitions(df: DataFrame, decoder: MultimodalDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, p) =>
        val (w, h) = decoder.decodeDims(p)
        (id, p.length, w, h)
      }
    }.toDF("doc_id", "n_bytes", "width", "height")
  }
}
