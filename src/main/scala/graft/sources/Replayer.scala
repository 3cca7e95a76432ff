package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** S2 — the producer/ingest adapter (SURVEY.md §2.1): replays the shared
  * `events` table as the reference's position-event JSON contract
  * (`mbta_to_kafka.py:58-79` normalization: vehicleId coalescing, ISO-8601
  * `Z` timestamps, null speed passthrough), dropping sequential chunk
  * files into a directory that `StreamingJob.fileSource` watches.
  *
  * Like the reference's producer this is an out-of-engine driver loop —
  * ingest at scale is Kafka (S1); this adapter exists so the engine's
  * streaming path is end-to-end exercisable offline. Files are staged and
  * atomically moved so the file stream never sees partial chunks.
  */
object Replayer {

  /** JSON lines for one chunk (deterministic: chunk = event_id % chunks). */
  private[sources] def chunkJson(spark: SparkSession, sfDir: String,
                                 chunk: Int, chunks: Int): Seq[String] =
    Tables.positions(spark, sfDir)
      .filter(col("event_id") % chunks === chunk)
      .orderBy(col("event_id"))
      .select(to_json(struct(
        col("provider"), col("vehicleId"), col("lat"), col("lon"),
        col("speedKmh"),
        lit(null).cast("int").as("bearing"),
        lit(null).cast("int").as("accuracyM"),
        date_format(col("eventTs"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("ts"))).as("v"))
      .collect().map(_.getString(0)).toSeq

  /** Write chunk `i` atomically into `watchDir`. */
  def emitChunk(spark: SparkSession, sfDir: String, watchDir: String,
                chunk: Int, chunks: Int): Unit = {
    val dir = Paths.get(watchDir)
    Files.createDirectories(dir)
    // stage INSIDE the watch dir: ATOMIC_MOVE across filesystems throws
    // (default tmpdir is often tmpfs), and same-dir moves are always atomic
    val tmp = Files.createTempFile(dir, ".graft-replay", ".tmp")
    Files.write(tmp, String.join("\n",
      chunkJson(spark, sfDir, chunk, chunks): _*).getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(f"chunk-$chunk%05d.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Replay all chunks at once (tests) or one per poll interval. */
  def replayAll(spark: SparkSession, sfDir: String, watchDir: String,
                chunks: Int): Unit =
    (0 until chunks).foreach(emitChunk(spark, sfDir, watchDir, _, chunks))
}
