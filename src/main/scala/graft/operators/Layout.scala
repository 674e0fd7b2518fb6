package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout management: multi-dimensional (Morton / z-order)
  * clustering for scan pruning — the `OPTIMIZE ZORDER BY` of the
  * lakehouse engines, re-expressed as plain Spark.
  *
  * The reference stores graph pages in insertion order and relies on its
  * buffer pool for locality (reference: `src/storage/file_storage.cpp`,
  * `buffer_pool.cpp`); at 100 TB the analogous lever is FILE layout: a
  * parquet reader prunes row groups whose column min/max stats miss the
  * predicate, so the fraction of data read for a selective scan is
  * decided when the table is WRITTEN. A table range-sorted on one key
  * prunes perfectly on that key and not at all on any other; interleaving
  * the bits of two keys (the Morton curve) bounds every file's bounding
  * box in BOTH dimensions, so a 2-D box predicate touches O(perimeter)
  * granules instead of O(1/k) of the table.
  *
  * Everything here is codegen'd integer arithmetic on built-in functions
  * (shiftleft/shiftright/bitwiseAND sums — no UDF), one metadata-scale
  * bounds aggregate broadcast back, and one partial+final aggregate for
  * the per-bucket stats: a single shuffle of ≤ (2 × buckets × partitions)
  * partial rows whatever the table size. The layout WRITE at cluster
  * scale is `repartitionByRange(zv)` + `sortWithinPartitions(zv)` — a
  * sample-ranged exchange, exactly one shuffle of the table, same cost
  * shape as the single-key sort it replaces (measured granule-pruning
  * effect: ScaleSmoke `zorder_pruning`).
  */
object Layout {

  /** Bits per dimension for the z-value quantization grid. */
  val ZBits = 16

  /** Top bits of the z-value used as the bucket id: 6 bits = 64 buckets
    * = an 8×8 grid over the top 3 quantized bits of each dimension. */
  val ZBucketBits = 6

  /** Interleave the low `ZBits` bits of two quantized coordinates:
    * x bits land at even positions, y bits at odd — the Morton code.
    * A static 2·ZBits-term sum of built-in bit ops, fully codegen'd. */
  def zInterleave(xq: Column, yq: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(xq, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yq, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Orders relation reduced to the two layout dimensions, all BIGINT:
    * customer key and days-since-1992-01-01 (both engines compute day
    * numbers from the same epoch, so quantization is integer-exact). */
  private def dims(t: Tables): DataFrame =
    t.orders.select(
      col("o_custkey").as("ck"),
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
        .cast("long").as("dy"))

  /** q249: per-bucket bounding boxes under the two layouts.
    *
    * For the same 64-bucket budget, assign every order row to
    *  - its `linear` bucket (fixed-width ranges of ck alone — the
    *    single-key sort layout), and
    *  - its `zorder` bucket (top ZBucketBits bits of the Morton code) —
    * then report each bucket's row count and min/max in BOTH dimensions.
    * The result IS the pruning argument in relation form: every zorder
    * bucket's bounding box spans ≈1/8 of each dimension, so a 2-D box
    * predicate overlaps a handful of buckets, while every linear bucket
    * spans the FULL day range and only the ck predicate can prune.
    * Integer arithmetic end-to-end (quantization by integer division,
    * `div`), so the oracle hash-matches bit-for-bit.
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val o = dims(Tables(spark, dir))
    val bounds = o.agg(
      min("ck").as("minck"), max("ck").as("maxck"),
      min("dy").as("mindy"), max("dy").as("maxdy"))
    val mask = (1L << ZBits) - 1 // 65535
    val q = o.crossJoin(broadcast(bounds))
      .withColumn("xq",
        expr(s"((ck - minck) * $mask) div greatest(maxck - minck, 1)"))
      .withColumn("yq",
        expr(s"((dy - mindy) * $mask) div greatest(maxdy - mindy, 1)"))
      .withColumn("zv", zInterleave(col("xq"), col("yq")))
      .withColumn("zb", shiftright(col("zv"), 2 * ZBits - ZBucketBits))
      .withColumn("lb", expr(
        s"((ck - minck) * ${1 << ZBucketBits}) " +
          "div greatest(maxck - minck + 1, 1)"))
    q.select(
        expr("stack(2, 'linear', lb, 'zorder', zb) AS (layout, bucket)"),
        col("ck"), col("dy"))
      .groupBy(col("layout"), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min("ck").as("min_ck"), max("ck").as("max_ck"),
        min("dy").as("min_day"), max("dy").as("max_day"))
      .orderBy(col("layout"), col("bucket"))
  }

  /** The DuckDB-side Morton interleave over columns named xq/yq — the
    * same 32-term bit sum the Spark expression builds, emitted as SQL
    * text so the oracle and the engine share one definition. */
  def zInterleaveSql(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
}
