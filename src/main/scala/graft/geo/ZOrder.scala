package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) linearization of the axial hex grid — the physical
  * layout primitive for spatial locality: sorting/range-partitioning tile
  * data by `z` keeps geographically-near cells in the same file/partition,
  * so a map-viewport range scan touches few files instead of all of them
  * (the multi-dimensional generalization of `sink.TileLayout`'s
  * date+cell sort; same idea as Delta/Iceberg Z-ordering).
  *
  * The z-value is pure integer bit-interleaving of the two (offset) axial
  * coordinates — exactly reproducible in any engine; [[zvalueSql]] emits
  * the identical formula for the DuckDB oracle.
  */
object ZOrder {

  /** Interleave the low `bits` of signed q/r (offset to non-negative):
    * bit b of q lands at 2b, bit b of r at 2b+1.
    *
    * Domain: coordinates are clamped to [-2^(bits-1), 2^(bits-1)-1] before
    * interleaving. Without the clamp an out-of-range coordinate wraps after
    * the +offset and its high bits truncate, so far-apart cells could
    * interleave into the same z-range — silently breaking the locality
    * guarantee [[layoutByZ]] relies on. Clamped cells degrade gracefully:
    * they pile up at the domain edge (locality preserved for everything
    * in-range). [[zvalueSql]] applies the identical clamp. */
  def zvalue(q: Column, r: Column, bits: Int = 16): Column = {
    val off = 1L << (bits - 1)
    val qo = greatest(lit(-off), least(lit(off - 1), q)) + lit(off)
    val ro = greatest(lit(-off), least(lit(off - 1), r)) + lit(off)
    (0 until bits).map { b =>
      shiftright(qo, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(ro, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }

  /** SQL twin of [[zvalue]] over column names (DuckDB `>>`/`&`),
    * including the same domain clamp. */
  def zvalueSql(qCol: String, rCol: String, bits: Int = 16): String = {
    val off = 1L << (bits - 1)
    val qc = s"GREATEST(-$off, LEAST(${off - 1}, $qCol))"
    val rc = s"GREATEST(-$off, LEAST(${off - 1}, $rCol))"
    "(" + (0 until bits).map { b =>
      s"((($qc + $off) >> $b) & 1) * ${1L << (2 * b)} + " +
        s"((($rc + $off) >> $b) & 1) * ${1L << (2 * b + 1)}"
    }.mkString(" + ") + ")"
  }

  /** Range-partition and sort `df` by its z-value — the write-side layout
    * step: each output file covers one contiguous z-range ≈ one spatial
    * blob, so reads prune by z-range predicates. */
  def layoutByZ(df: DataFrame, q: Column, r: Column, partitions: Int = 32): DataFrame = {
    val withZ = df.withColumn("z", zvalue(q, r))
    withZ.repartitionByRange(partitions, col("z")).sortWithinPartitions(col("z"))
  }

  /** Materialize [[layoutByZ]] as directory-partitioned parquet keyed by a
    * z-bucket (z div 2^bucketShift): a map-viewport query filtering on
    * z-range becomes PartitionFilters at the scan — directories outside
    * the viewport are never listed, the multi-dimensional analogue of
    * [[graft.sink.TileLayout]]'s date pruning. Within each bucket
    * directory rows stay z-sorted, so parquet row-group min/max statistics
    * prune further. `ZOrderLayoutSpec` asserts both effects. */
  def writeZPartitioned(df: DataFrame, q: Column, r: Column, path: String,
                        bucketShift: Int = 12): Unit =
    df.withColumn("z", zvalue(q, r))
      .withColumn("z_bucket", expr(s"z div ${1L << bucketShift}"))
      .repartition(col("z_bucket"))
      .sortWithinPartitions(col("z_bucket"), col("z"))
      .write.mode("overwrite").partitionBy("z_bucket").parquet(path)
}
