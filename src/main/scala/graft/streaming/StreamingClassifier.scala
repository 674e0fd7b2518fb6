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
    * training docs against the inherited weights. */
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
    val delta = Classifier.roundDelta(Classifier.labeled(batch), prev)
    val w = Array.tabulate(buckets + 1)(b =>
      prev(b) + delta.getOrElse(b, 0L))
    w.toIndexedSeq.zipWithIndex.map { case (v, b) => (b.toLong, v) }
      .toDF("b", "wv")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/weights/b=$batchId")
    Snapshots.prune(spark, s"$storeDir/weights", batchId)
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
    FileFeed.run(spark, docs, nChunks = 4, col("doc_id"),
      ordered = true, purpose = "clf") { (batch, batchId) =>
      classifierBatch(batch, storeDir, batchId)
    }
    classifierTable(spark, storeDir, docs)
  }
}
