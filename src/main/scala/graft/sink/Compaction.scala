package graft.sink

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for keyed-table/tile outputs. Streaming sinks and
  * per-epoch writes accumulate many small parquet files; at scale the
  * file-listing and task-per-file overhead eventually dominates reads
  * (the classic small-files problem). Compaction rewrites a directory to
  * ~`targetBytes`-sized files and atomically swaps it in.
  */
object Compaction {

  def dirBytes(dir: String): Long =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length()).sum

  def parquetFileCount(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .count(f => f.isFile && f.getName.endsWith(".parquet"))

  /** Rewrite `dir` into max(1, ceil(bytes / targetBytes)) files. The
    * rewrite lands in a sibling temp dir first; the swap is two renames,
    * so a crash leaves either the old or the new directory complete. */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val bytes = dirBytes(dir)
    val nFiles = Math.max(1, Math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = dir + ".compact-tmp"
    val old = dir + ".compact-old"
    spark.read.parquet(dir).coalesce(nFiles)
      .write.mode("overwrite").parquet(tmp)
    Files.move(Paths.get(dir), Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(dir), StandardCopyOption.ATOMIC_MOVE)
    deleteRec(new java.io.File(old))
    nFiles
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
    f.delete()
  }
}
