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

  /** Bucketize for a UNIQUE total order `(key [desc], id asc)` with `id`
    * unique: when the key domain is small (≤ 4096 distinct representable
    * values — exactly the parts-per-thousand score case), each key VALUE
    * gets its own bin and rows inside it are further split by value-bins
    * of `id`. A clamp-heavy corpus (half the documents at score 0 or
    * 1000 — routine after templated/boilerplate text) then still spreads
    * across ~parallelism buckets, where single-key value-binning would
    * concentrate it in ONE window task. Splitting ties across buckets is
    * sound here because no running quantity can tie across the boundary
    * when the window order carries the unique id — it is NOT sound for
    * rank/dense_rank, which must see all key ties together (those use
    * [[bucketizeByValue]]). Wide key domains fall back to plain value
    * bins (a wide domain cannot mass-tie on one value in the first
    * place, and per-value bins would blow the offsets collect). */
  def bucketizeForUniqueOrder(df: DataFrame, key: Column, desc: Boolean,
      id: Column): DataFrame = {
    val mm = df.agg(min(key), max(key), min(id), max(id)).head()
    if (mm.isNullAt(0)) return df.withColumn("bucket", lit(0L)) // empty input
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val (ilo, ihi) = (mm.getLong(2), mm.getLong(3))
    val n = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    if (hi - lo + 1 <= 4096) {
      val iwidth = math.max(1L, (ihi - ilo + n) / n)
      val kpos = if (desc) lit(hi) - key else key - lit(lo)
      // observed buckets ≤ domain × (n+1): still a metadata-scale collect
      df.withColumn("bucket", kpos.cast("long") * lit(n + 1L)
        + ((id - lit(ilo)) / lit(iwidth)).cast("long"))
    } else bucketizeByValue(df, key, desc)
  }

  /** GROUPED exclusive offsets: per-(group, bucket) single long-valued
    * aggregates cumulated into per-GROUP exclusive prefix bases on the
    * driver — the grouped form of [[exclusiveOffsets]] (per-source
    * quota cumsum, per-language ranks). The collect is groups × buckets
    * rows; groups are curated dimensions (sources, languages), so this
    * stays metadata scale. Returns (group, bucket, base) rows plus the
    * per-group grand totals.
    *
    * Preconditions (fail-fast, not silent): `groupCol` must be a
    * NON-NULL string column (a null group would otherwise vanish in the
    * caller's later equi-join), and `agg` must evaluate to LongType (a
    * double/decimal sum would corrupt the integer prefix bases). */
  def exclusiveOffsetsBy(bucketed: DataFrame, groupCol: String,
      agg: Column): (Seq[(String, Long, Long)], Seq[(String, Long)]) = {
    val grp = bucketed.groupBy(col(groupCol), col("bucket"))
      .agg(agg)
      .collect().map { r =>
        require(!r.isNullAt(0), s"exclusiveOffsetsBy: null '$groupCol' " +
          "group value — group keys must be non-null strings")
        val t = r.get(2) match {
          case l: java.lang.Long => l.longValue()
          case other => throw new IllegalArgumentException(
            "exclusiveOffsetsBy: aggregate must be LongType, got " +
              (if (other == null) "null"
               else other.getClass.getSimpleName))
        }
        (r.getString(0), r.getLong(1), t)
      }
    val bases = grp.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (_, b, t) =>
        val base = (g, b, acc); acc += t; base
      }
    }
    val totals = grp.groupBy(_._1).map { case (g, rows) =>
      (g, rows.map(_._3).sum)
    }.toSeq
    (bases, totals)
  }

  /** The SQL-spec ntile(k) tile of global rank `rn` (1-based) among
    * `total` rows: the first total%k tiles get one extra row. The
    * division by q in the ELSE branch is lazily unreachable when
    * total < k (then q = 0 but every rank ≤ (q+1)·r). */
  def ntileFromRank(rn: Column, total: Column, k: Long): Column = {
    val q = floor(total / lit(k)).cast("long")
    val r = total % lit(k)
    when(rn <= (q + 1) * r, floor((rn - 1) / (q + 1)) + 1)
      .otherwise(r + floor((rn - r * (q + 1) - 1) / q) + 1)
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
