package graft.geo

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits: known values") {
    // q=0,r=0 with 16-bit offset 32768: both have only bit 15 set →
    // z bits 30 (q) and 31 (r) → 2^30 + 2^31
    val z = Seq((0L, 0L)).toDF("q", "r")
      .select(ZOrder.zvalue($"q", $"r").as("z")).head().getLong(0)
    assert(z === (1L << 30) + (1L << 31))
    // q=1,r=0 adds bit 0 of q → +1 ; q=0,r=1 adds bit 1 → +2
    val z10 = Seq((1L, 0L)).toDF("q", "r").select(ZOrder.zvalue($"q", $"r")).head().getLong(0)
    val z01 = Seq((0L, 1L)).toDF("q", "r").select(ZOrder.zvalue($"q", $"r")).head().getLong(0)
    assert(z10 === z + 1 && z01 === z + 2)
  }

  test("z-order locality: neighbors are closer in z than far cells, on average") {
    val grid = for (q <- -20L to 20L; r <- -20L to 20L) yield (q, r)
    val df = grid.toDF("q", "r").select($"q", $"r", ZOrder.zvalue($"q", $"r").as("z"))
    val zmap = df.collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    def dz(a: (Long, Long), b: (Long, Long)) = math.abs(zmap(a) - zmap(b)).toDouble
    val neighborAvg = grid.collect { case (q, r) if q < 20 => dz((q, r), (q + 1, r)) }
      .sum / grid.count(_._1 < 20)
    val farAvg = grid.collect { case (q, r) if q <= 0 => dz((q, r), (q + 20, r)) }
      .sum / grid.count(_._1 <= 0)
    assert(neighborAvg < farAvg / 3,
      s"neighbor dz $neighborAvg should be far below far-cell dz $farAvg")
  }

  test("zvalue clamps out-of-domain coordinates instead of corrupting them") {
    // 2^20 is far outside the 16-bit domain; unclamped it would wrap after
    // the +offset and interleave like a small coordinate. Clamped, it pins
    // to the domain edge (the max in-domain z for that axis).
    val edge = Seq((32767L, 32767L)).toDF("q", "r")
      .select(ZOrder.zvalue($"q", $"r")).head().getLong(0)
    val far = Seq((1L << 20, 1L << 20)).toDF("q", "r")
      .select(ZOrder.zvalue($"q", $"r")).head().getLong(0)
    val farNeg = Seq((-(1L << 20), -(1L << 20))).toDF("q", "r")
      .select(ZOrder.zvalue($"q", $"r")).head().getLong(0)
    assert(far === edge, "overflow clamps to the top corner")
    assert(farNeg === 0L, "underflow clamps to the origin corner")
    // clamp is monotone: an in-domain cell never z-sorts above the clamp edge
    val mid = Seq((100L, 100L)).toDF("q", "r")
      .select(ZOrder.zvalue($"q", $"r")).head().getLong(0)
    assert(farNeg <= mid && mid <= far)
  }

  test("writeZPartitioned: viewport z-range scan prunes partitions at the source") {
    val dir = java.nio.file.Files.createTempDirectory("zpart").toString
    val grid = (for (q <- -50L to 50L; r <- -50L to 50L) yield (q, r)).toDF("q", "r")
    ZOrder.writeZPartitioned(grid, $"q", $"r", dir, bucketShift = 8)
    val all = spark.read.parquet(dir)
    val buckets = all.select("z_bucket").distinct().as[Long].collect().sorted
    val nBuckets = buckets.length
    assert(nBuckets > 4, s"layout should spread buckets, got $nBuckets")
    // a small viewport = a narrow z-range = few buckets
    val viewport = all.filter($"z_bucket".between(buckets(1), buckets(2)))
    val plan = viewport.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[\\]".r.findFirstIn(plan).isEmpty,
      s"z_bucket predicate must reach PartitionFilters:\n${plan.take(800)}")
    // the scan's file index selected fewer partition dirs than exist
    val scanned: Int = viewport.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }.sum
    assert(scanned < nBuckets && scanned > 0,
      s"expected pruning: scanned $scanned of $nBuckets buckets")
    // and correctness: pruned read ≡ brute recompute of the same range
    val brute = (for (q <- -50L to 50L; r <- -50L to 50L) yield (q, r)).toDF("q", "r")
      .select(ZOrder.zvalue($"q", $"r").as("z"))
      .filter(($"z" / lit(256L)).cast("long").between(buckets(1), buckets(2)))
    assert(viewport.count() == brute.count())
  }

  test("layoutByZ: files cover disjoint contiguous z ranges") {
    val grid = (for (q <- -50L to 50L; r <- -50L to 50L) yield (q, r)).toDF("q", "r")
    val laid = ZOrder.layoutByZ(grid, $"q", $"r", 8)
    val ranges = laid.rdd.mapPartitions { it =>
      val zs = it.map(_.getAs[Long]("z")).toSeq
      if (zs.isEmpty) Iterator.empty
      else Iterator((zs.min, zs.max, zs == zs.sorted))
    }.collect().sortBy(_._1)
    assert(ranges.forall(_._3), "each partition sorted by z")
    ranges.sliding(2).foreach {
      case Array((_, max1, _), (min2, _, _)) => assert(max1 <= min2, "ranges disjoint")
      case _ => ()
    }
  }
}
