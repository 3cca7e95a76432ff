package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round14bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pathProductRollup: quantities multiply down the tree") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id").withColumn("is_root", col("id") === 1)
    // 1 -(2)-> 2 -(3)-> 4 ; 1 -(5)-> 3
    val edges = Seq((1L, 2L, 2L), (2L, 4L, 3L), (1L, 3L, 5L))
      .toDF("src", "dst", "qty")
    val r = Hierarchy.pathProductRollup(nodes, edges, "is_root", 5)
      .as[(Long, Long, Long)].collect().map { case (id, d, q) => id -> ((d, q)) }.toMap
    assert(r === Map(1L -> ((0L, 1L)), 2L -> ((1L, 2L)),
      3L -> ((1L, 5L)), 4L -> ((2L, 6L))))
  }

  test("pathProductRollup: diamond takes the min product") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id").withColumn("is_root", col("id") === 1)
    // two same-depth paths to 4: 1-2-4 (2*7=14), 1-3-4 (5*1=5) -> 5
    val edges = Seq((1L, 2L, 2L), (1L, 3L, 5L), (2L, 4L, 7L), (3L, 4L, 1L))
      .toDF("src", "dst", "qty")
    val r = Hierarchy.pathProductRollup(nodes, edges, "is_root", 5)
      .filter(col("id") === 4).select("eff_qty").as[Long].head()
    assert(r === 5L)
  }

  test("bootstrapCi: envelope brackets the point estimate") {
    val df = spark.range(0, 2000)
      .select(lit("g").as("g"), col("id"), (col("id") % 100 * 10).as("cents"))
    val r = Experiment.bootstrapCi(df, "g", "id", "cents")
      .select("mean_e4", "boot_lo_e4", "boot_hi_e4", "n_resamples")
      .as[(Long, Long, Long, Long)].head()
    assert(r._4 === 16L)
    assert(r._2 <= r._1 && r._1 <= r._3, s"envelope [${r._2}, ${r._3}] vs ${r._1}")
    // resample means of a mean-495-cents population stay in a tight band
    assert(r._3 - r._2 < 1000000L, "envelope implausibly wide")
  }

  test("gramMatrix: diagonal of a one-hot corpus counts occurrences") {
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val r = Similarity.gramMatrix(rows, 2)
      .select("i", "j", "g_e12").as[(Long, Long, Long)].collect()
      .map { case (i, j, g) => ((i, j), g) }.toMap
    assert(r === Map((0L, 0L) -> 2000000000000L, (0L, 1L) -> 0L,
      (1L, 1L) -> 1000000000000L))
  }
}
