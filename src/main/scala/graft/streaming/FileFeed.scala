package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Shared file-source feed harness for the registered streaming entries
  * (q133/q135/q154/q162): write the fixture as N parquet chunks, stream
  * them back `maxFilesPerTrigger 1` (micro-batches arrive WITHOUT driver
  * materialization — the q133 feed discipline), run the per-batch body
  * under a checkpoint with `Trigger.AvailableNow`, and leave assembly to
  * the caller. Temp feed/checkpoint dirs are registered for deletion at
  * JVM exit.
  *
  * `ordered = false`: chunks are range partitions of `key` written in one
  * distributed pass — file order is irrelevant to order-insensitive
  * consumers (the dedup stores, the MV merge).
  *
  * `ordered = true`: chunks are VALUE-RANGE bins of the long-valued `key`
  * (fixed-width over the observed [min, max] — one metadata min/max
  * aggregate), ALL written in one distributed pass (repartition on the
  * bin id + partitionBy, one file per non-empty bin), then each moved
  * into the flat feed dir under an ascending zero-padded name with a
  * STRICTLY ascending explicit mtime stamp (rename + setTimes — two
  * metadata ops per bin, no data movement). The file source processes
  * files in modification-time order but leaves same-mtime ties
  * unspecified; the explicit stamps remove the ties entirely (and the
  * ascending names are a second witness of the same order). This is the
  * contract order-SENSITIVE consumers (the q154 funnel state machine)
  * rely on, and it holds for any value range — never derived from
  * calendar fields. */
private[graft] object FileFeed {

  /** Chunk count for the registered ORDERED feeds whose oracles replay
    * the chunk assignment arithmetically (q216 drift, q220 online
    * classifier): SparkEntry generates both the `(hi−lo)//N+1` bin
    * arithmetic and the per-chunk CTE unroll from this constant —
    * change it here and both sides move together. */
  private[graft] val StreamChunks = 4

  /** Write the feed chunks; returns (tmpDir, feedDir). `baseDir`
    * overrides the temp location (the no-op-setTimes guard spec points
    * it at a filesystem that ignores mtime stamps). */
  private[graft] def prepare(spark: SparkSession, df: DataFrame,
      nChunks: Int, key: Column, ordered: Boolean, purpose: String,
      baseDir: Option[String] = None): (String, String) = {
    // default resolves through spark.graft.storeRoot (Snapshots.storeDir)
    // so the feed lands on the shared FS a cluster's executors can read;
    // feeds are transient either way, hence the unconditional deleteOnExit
    val tmp = baseDir.getOrElse(Snapshots.storeDir(spark, s"feed_$purpose"))
    val fsys = Snapshots.fs(spark, tmp)
    fsys.deleteOnExit(new org.apache.hadoop.fs.Path(tmp))
    val feedDir = s"$tmp/feed"
    if (!ordered) {
      df.repartitionByRange(nChunks, key).write.parquet(feedDir)
    } else {
      fsys.mkdirs(new org.apache.hadoop.fs.Path(feedDir))
      val mm = df.agg(min(key), max(key)).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val width = (hi - lo) / nChunks + 1
      // one distributed pass: repartition on the bin id co-locates each
      // bin in one task, partitionBy writes one file per non-empty bin
      val stage = s"$tmp/stage"
      df.withColumn("__chunk", ((key - lit(lo)) / lit(width)).cast("int"))
        .repartition(nChunks, col("__chunk"))
        .write.partitionBy("__chunk").parquet(stage)
      // bin order → feed order via metadata ops only: ascending names
      // plus strictly ascending explicit mtimes (no same-mtime ties for
      // the file source to break arbitrarily)
      val base = System.currentTimeMillis()
      val stamped = (0 until nChunks).flatMap { b =>
        fsys.globStatus(
            new org.apache.hadoop.fs.Path(s"$stage/__chunk=$b/part-*"))
          .map { st =>
            val dst =
              new org.apache.hadoop.fs.Path(f"$feedDir/chunk-$b%04d.parquet")
            fsys.rename(st.getPath, dst)
            fsys.setTimes(dst, base + b, -1)
            (dst, base + b)
          }
      }
      // FileSystem.setTimes is a SILENT no-op on some implementations
      // (the base class ignores it; object-store FSs commonly inherit
      // that), which would reintroduce same-mtime ties and quietly
      // degrade the order contract the funnel relies on. Read the
      // stamps back and verify strict ascent; where the FS ignored the
      // stamps, fail fast with the cause rather than feed an
      // unspecified order to an order-sensitive consumer.
      val readBack = stamped.map { case (p, want) =>
        (p, want, fsys.getFileStatus(p).getModificationTime)
      }
      val honored = readBack.forall { case (_, want, got) => got == want }
      val strict = readBack.map(_._3).sliding(2)
        .forall(w => w.length < 2 || w(0) < w(1))
      require(honored && strict,
        s"ordered feed needs strictly ascending mtimes, but ${fsys.getClass
          .getSimpleName}.setTimes was not honored (" +
        readBack.take(4).map { case (p, w, g) =>
          s"${p.getName}: want=$w got=$g" }.mkString(", ") +
        " …) — this FS cannot host an order-SENSITIVE feed; use an " +
        "FS with working setTimes or an order-insensitive consumer")
    }
    (tmp, feedDir)
  }

  /** The prepared feed as a file-source stream (order-sensitive
    * consumers that attach their own sink — the funnel). */
  def orderedStream(spark: SparkSession, df: DataFrame, nChunks: Int,
      key: Column, purpose: String): DataFrame = {
    val (_, feedDir) = prepare(spark, df, nChunks, key, ordered = true, purpose)
    spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", "1").parquet(feedDir)
  }

  /** Prepared feed driven through a foreachBatch body to completion. */
  def run(spark: SparkSession, df: DataFrame, nChunks: Int, key: Column,
      ordered: Boolean, purpose: String)(
      body: (DataFrame, Long) => Unit): Unit = {
    val (tmp, feedDir) = prepare(spark, df, nChunks, key, ordered, purpose)
    val q = spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", "1").parquet(feedDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        body(batch, batchId); ()
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
