package graft.streaming

import graft.Tables
import graft.operators.Classifier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ONLINE classifier training (q220) — the ingest-time
  * sibling of q218's batch perceptron: the model updates as data
  * arrives instead of iterating over a frozen corpus. Each micro-batch
  * applies ONE batch-perceptron round over its own training documents
  * against the weights inherited from the previous batch — which is
  * exactly the online-learning posture of a production ingest (the
  * perceptron is the original online algorithm; the per-batch grouping
  * makes it deterministic and parallel), and the final weights score
  * the whole corpus.
  *
  * Online ≠ batch BY DESIGN: q218 sweeps the full corpus five times,
  * this sees each document's batch once in arrival order — the two
  * rungs bracket the train-once-offline vs update-as-you-ingest
  * choice. Determinism: the ordered feed makes batch composition a
  * pure function of doc_id (the q216 chunk arithmetic), each round is
  * the q218 integer update, so the oracle unrolls one update block
  * per chunk and replays the trajectory exactly.
  *
  * Store: `weights/b=N` holds the (b, wv) vector AFTER folding batch
  * N (its `_SUCCESS` is the commit marker; replays of a committed
  * batch no-op; batch N reads the latest committed vector before N).
  * O(B+1) rows per batch — metadata.
  *
  * Scale shape per batch: q218's round shape restricted to the batch
  * (one margin aggregate + one semi-join + a 65-row collect) — O(batch
  * tokens), independent of everything already ingested. */
object StreamingClassifier {

  /** Fold one micro-batch: one perceptron round on the batch's
    * training docs against the inherited weights — but FIRST, the
    * generalization readout a production ingest gates on: the batch's
    * HELD-OUT documents scored under the INHERITED weights (the model
    * as it stood when this data arrived — progressive validation, so
    * no batch is ever scored by weights that saw it). The two additive
    * integers (correct, total) land under `stats/b=N`, an append-only
    * trajectory store the weight pruning never touches; the weights
    * write stays LAST (the batch's commit marker), so a crash between
    * the two replays both — deterministically, to identical bytes. */
  def classifierBatch(batch: DataFrame, storeDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (Snapshots.committed(spark, s"$storeDir/weights", batchId)) return
    val buckets = Classifier.PerceptronBuckets
    val prev: Array[Long] =
      Snapshots.latest(spark, s"$storeDir/weights", batchId) match {
        case Some(p) =>
          val m = spark.read.parquet(p).collect()
            .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
          Array.tabulate(buckets + 1)(b => m.getOrElse(b, 0L))
        case None => Array.fill(buckets + 1)(0L)
      }
    val xy = Classifier.labeled(batch)
    val held = Classifier.scoreWith(xy.filter(!col("is_train")), prev)
      .agg(coalesce(sum(when(col("predicted") === col("label"), lit(1L))
          .otherwise(lit(0L))), lit(0L)).as("held_correct"),
        count(lit(1)).as("held_total"))
      .head()
    Seq((batchId, held.getLong(0), held.getLong(1)))
      .toDF("batch_id", "held_correct", "held_total")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/stats/b=$batchId")
    val delta = Classifier.roundDelta(xy, prev)
    val w = Array.tabulate(buckets + 1)(b =>
      prev(b) + delta.getOrElse(b, 0L))
    w.toIndexedSeq.zipWithIndex.map { case (v, b) => (b.toLong, v) }
      .toDF("b", "wv")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/weights/b=$batchId")
    Snapshots.prune(spark, s"$storeDir/weights", batchId)
  }

  /** Held-out accuracy trajectory: one row per committed batch —
    * (batch_id, held_correct, held_total) under the weights inherited
    * at that batch's arrival. The committed-partition read barrier is
    * the stats dir's own _SUCCESS (a half-replayed batch's row is
    * rewritten to identical bytes, so early visibility is benign). */
  def classifierHeldoutTable(spark: SparkSession,
      storeDir: String): DataFrame = {
    val ids = Snapshots.committedIds(spark, s"$storeDir/stats")
    (if (ids.nonEmpty)
       spark.read.parquet(s"$storeDir/stats")
         .filter(col("b").isin(ids: _*)).drop("b")
     else spark.range(0).select(col("id").as("batch_id"),
       col("id").as("held_correct"), col("id").as("held_total")))
      .orderBy(col("batch_id"))
  }

  /** Score a corpus under the latest committed weights. */
  def classifierTable(spark: SparkSession, storeDir: String,
      docs: DataFrame): DataFrame = {
    val buckets = Classifier.PerceptronBuckets
    val w = Snapshots.latest(spark, s"$storeDir/weights", Long.MaxValue)
      .map { p =>
        val m = spark.read.parquet(p).collect()
          .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
        Array.tabulate(buckets + 1)(b => m.getOrElse(b, 0L))
      }
      .getOrElse(Array.fill(buckets + 1)(0L))
    Classifier.scoreWith(Classifier.labeled(docs), w)
  }

  /** Registered q220 entry: the fixture corpus as a 4-chunk ORDERED
    * file-source stream folded through [[classifierBatch]], then the
    * whole corpus scored under the final online weights. */
  def streamingClassifier(spark: SparkSession, dir: String): DataFrame = {
    val storeDir = Snapshots.storeDir(spark, "stream_clf_store")
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    FileFeed.run(spark, docs, nChunks = FileFeed.StreamChunks,
      col("doc_id"), ordered = true, purpose = "clf") { (batch, batchId) =>
      classifierBatch(batch, storeDir, batchId)
    }
    classifierTable(spark, storeDir, docs)
  }

  /** Registered q222 entry: the same ordered feed, read out as the
    * per-batch held-out accuracy trajectory — the generalization-drift
    * monitor (each batch scored by the weights that had NOT yet seen
    * it). Oracle: the q220 unroll's inherited-weight relations w0..w3
    * scoring each chunk's held-out docs. */
  def streamingClassifierHeldout(spark: SparkSession,
      dir: String): DataFrame = {
    val storeDir = Snapshots.storeDir(spark, "stream_clf_ho_store")
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    FileFeed.run(spark, docs, nChunks = FileFeed.StreamChunks,
      col("doc_id"), ordered = true, purpose = "clfho") { (batch, batchId) =>
      classifierBatch(batch, storeDir, batchId)
    }
    classifierHeldoutTable(spark, storeDir)
  }
}
