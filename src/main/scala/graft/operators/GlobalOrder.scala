package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global-order primitive — the reusable core of every
  * "global ORDER BY + running aggregate" operator in the engine (global
  * ranking, token-budget cumsum, sequence packing; the CSR prefix sum in
  * GraphOps predates it with the same shape).
  *
  * An unpartitioned `Window.orderBy` moves the whole table into ONE task —
  * the classic 100×-scale killer. This primitive replaces it with the
  * two-pass pattern:
  *
  *   1. [[bucketizeByValue]]: value-bucket rows by the integer sort key
  *      (fixed-width bins over the observed [min,max]; deterministic, no
  *      sampling; equal keys always share a bucket, so a within-bucket
  *      order extends to the global total order);
  *   2. [[exclusiveOffsets]]: per-bucket aggregates (≤ #buckets rows —
  *      metadata scale) are collected and cumulated in bucket order on
  *      the driver into EXCLUSIVE prefix bases (sum over all lower
  *      buckets), to be broadcast back;
  *   3. the caller computes the local (per-bucket, partitioned-window)
  *      version of its running quantity in parallel and adds the bucket's
  *      base.
  */
private[graft] object GlobalOrder {

  /** Adds a `bucket` column: fixed-width bins over the observed [lo, hi]
    * of the integer `key` (one 1-row min/max metadata aggregate). Bucket 0
    * holds the smallest values — or the largest when `desc` — so bucket
    * order equals global key order. */
  def bucketizeByValue(df: DataFrame, key: Column, desc: Boolean): DataFrame = {
    val mm = df.agg(min(key), max(key)).head()
    if (mm.isNullAt(0)) return df.withColumn("bucket", lit(0L)) // empty input
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val n = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    val width = math.max(1L, (hi - lo + n) / n)
    val pos = if (desc) lit(hi) - key else key - lit(lo)
    df.withColumn("bucket", (pos / lit(width)).cast("long"))
  }

  /** Exclusive per-bucket prefix bases of the given long-valued
    * aggregates: `(bucket, [base_0..base_k])` where `base_i` is the sum
    * of aggregate i over all LOWER buckets, plus the grand totals. The
    * collect is bounded by the bucket count (≈ parallelism), not the
    * data. */
  def exclusiveOffsets(bucketed: DataFrame,
      aggCols: Seq[Column]): (Seq[(Long, Seq[Long])], Seq[Long]) = {
    var accs = Vector.fill(aggCols.size)(0L)
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(aggCols.head, aggCols.tail: _*)
      .collect().sortBy(_.getLong(0))
      .map { r =>
        val bases = (r.getLong(0), accs: Seq[Long])
        accs = accs.zipWithIndex.map { case (a, i) => a + r.getLong(i + 1) }
        bases
      }.toSeq
    (offsets, accs)
  }
}
