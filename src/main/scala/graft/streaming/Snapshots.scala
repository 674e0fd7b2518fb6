package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-keyed snapshot store shared by the incremental streaming
  * operators (dedup stores, the materialized view): every micro-batch
  * writes its cumulative artifact under `dir/b=<batchId>/`, the write's
  * `_SUCCESS` doubles as the batch's commit marker (replays of a
  * committed batch are no-ops, replays of a half-written one overwrite
  * it), readers list directory names — never scan data — to find the
  * latest committed snapshot, and snapshots older than batchId−1 are
  * pruned (a replay of batch N only ever needs N−1). All probes go
  * through Hadoop FileSystem, so stores live on HDFS/S3 unchanged.
  */
private[streaming] object Snapshots {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def pathExists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** Resolve a fresh state-store directory for a streaming operator.
    *
    * With `spark.graft.storeRoot` set, the store lives at
    * `<storeRoot>/<name>-<n>` (first unused n), resolved through Hadoop
    * FileSystem — an HDFS/S3/GCS root works unchanged, which is what a
    * cluster deployment MUST use: state written to a driver-local temp
    * dir is invisible to executors on other hosts. Stores under a
    * configured root are RETAINED at JVM exit (shared state outlives
    * the driver) — which means they ACCUMULATE across driver runs:
    * snapshot pruning ([[prune]]) bounds each store's interior, but
    * reclaiming retired `<name>-<n>` stores (and their `.claim-*`
    * markers) is a deployment-level retention job, same as any
    * checkpoint location.
    *
    * Unset (the default), falls back to a driver-local temp dir
    * registered for deletion at JVM exit — the local[*] test posture,
    * where driver-local is correct because every task shares the
    * filesystem. */
  def storeDir(spark: SparkSession, name: String): String =
    spark.conf.getOption("spark.graft.storeRoot") match {
      case Some(root) if root.nonEmpty =>
        val base = root.stripSuffix("/")
        val f = fs(spark, base)
        f.mkdirs(new Path(base))
        // claim the slot ATOMICALLY: createNewFile is exclusive-create
        // on HDFS/S3A/local, so two drivers racing on the same root
        // cannot both claim slot n — the loser sees false (or a
        // same-path IOException) and probes the next slot. mkdirs
        // alone can't arbitrate: it succeeds when the dir exists.
        val n = Iterator.from(0).find { i =>
          !f.exists(new Path(s"$base/$name-$i")) &&
            (try f.createNewFile(new Path(s"$base/.claim-$name-$i"))
             catch { case _: java.io.IOException => false })
        }.get
        val dir = s"$base/$name-$n"
        f.mkdirs(new Path(dir))
        dir
      case _ =>
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_$name").toString
        fs(spark, dir).deleteOnExit(new Path(dir))
        dir
    }

  /** Batch N committed ⟺ its snapshot's _SUCCESS exists. */
  def committed(spark: SparkSession, snapDir: String, batchId: Long): Boolean =
    pathExists(spark, s"$snapDir/b=$batchId/_SUCCESS")

  /** All committed batch ids under an append-per-batch store root —
    * the read barrier every monitor readout must apply: a `b=N` dir
    * left by a crash mid-write (part files present, _SUCCESS missing)
    * must stay invisible until its replay overwrites it. Directory
    * listing only, never a data scan. */
  def committedIds(spark: SparkSession, root: String): Seq[Long] =
    if (!pathExists(spark, root)) Seq.empty
    else fs(spark, root).listStatus(new Path(root)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("b="))
      .flatMap(n => scala.util.Try(n.drop(2).toLong).toOption)
      .filter(id => committed(spark, root, id))

  /** Latest COMMITTED snapshot strictly before `before`. */
  def latest(spark: SparkSession, snapDir: String,
      before: Long): Option[String] = {
    val f = fs(spark, snapDir)
    val root = new Path(snapDir)
    if (!f.exists(root)) None
    else f.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("b="))
      .flatMap(p => scala.util.Try(p.getName.drop(2).toLong).toOption
        .filter(id => id < before && f.exists(new Path(p, "_SUCCESS")))
        .map(id => (id, p.toString)))
      .sortBy(_._1).lastOption.map(_._2)
  }

  /** Drop snapshots older than batchId−1. */
  def prune(spark: SparkSession, snapDir: String, batchId: Long): Unit = {
    val f = fs(spark, snapDir)
    val root = new Path(snapDir)
    if (f.exists(root))
      f.listStatus(root).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("b="))
        .filter(p => scala.util.Try(p.getName.drop(2).toLong).toOption
          .exists(_ < batchId - 1))
        .foreach(p => f.delete(p, true))
  }

  /** Merge the previous cumulative snapshot with a per-key delta —
    * O(previous distinct keys + batch keys), never O(underlying rows).
    * `measures` are the long-valued columns to sum. */
  def merge(spark: SparkSession, snapDir: String, batchId: Long,
      delta: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val prev = latest(spark, snapDir, batchId)
      .map(spark.read.parquet(_)).getOrElse(delta.limit(0))
    val aggs = measures.map(m => sum(col(m)).cast("long").as(m))
    prev.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Merge the previous snapshot with a LATEST-STATE delta: one row per
    * key survives, the one with the highest `ord` value (update-log
    * compaction — the non-additive sibling of [[merge]], for stores
    * whose rows are full replacement states carrying a monotone update
    * counter, like the q154 funnel slots). Same cost shape:
    * O(previous keys + batch keys). */
  def mergeLatest(spark: SparkSession, snapDir: String, batchId: Long,
      delta: DataFrame, keys: Seq[String], ord: String): DataFrame = {
    val prev = latest(spark, snapDir, batchId)
      .map(spark.read.parquet(_)).getOrElse(delta.limit(0))
    val payload = delta.columns.filterNot(keys.contains).toSeq
    prev.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(ord)).as("s"))
      .select(keys.map(col) ++ payload.map(c => col(s"s.$c").as(c)): _*)
  }
}
