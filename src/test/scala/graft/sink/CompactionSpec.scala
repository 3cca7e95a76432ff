package graft.sink

import java.nio.file.Files
import graft.{SparkSpec, Tables}

class CompactionSpec extends SparkSpec {

  test("compaction collapses many small files without changing the data") {
    val dir = Files.createTempDirectory("compact").toString + "/table"
    val src = Tables.lineitem(spark, sf())
    src.repartition(37).write.mode("overwrite").parquet(dir)
    assert(Compaction.parquetFileCount(dir) >= 30)
    val before = spark.read.parquet(dir).collect().toSet

    val nFiles = Compaction.compact(spark, dir) // default 128 MB target → 1 file here
    assert(nFiles == 1)
    assert(Compaction.parquetFileCount(dir) == 1)
    assert(spark.read.parquet(dir).collect().toSet == before)
    // temp/old dirs cleaned up
    assert(!new java.io.File(dir + ".compact-tmp").exists())
    assert(!new java.io.File(dir + ".compact-old").exists())
  }
}
