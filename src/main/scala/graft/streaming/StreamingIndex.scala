package graft.streaming

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ANN-index ingest (q226) — the maintenance side of the
  * RAG/similarity serving tier: new vectors arrive as micro-batches and
  * are encoded into the IVFADC index INCREMENTALLY under a FROZEN
  * quantizer (coarse cells + residual-PQ codebook trained once on a
  * snapshot — the q133/q135 train-once-freeze posture, and how real ANN
  * deployments run: re-training moves every stored code, so ingest
  * never does it). Each batch pays one assign/residualize/encode map
  * pass over ITS OWN rows and appends (vec_id, cell, codes) under
  * `codes/b=N` — the commit marker; replays no-op (the q202 store
  * discipline).
  *
  * Serving parity is EXACT by construction: batch-wise encoding under a
  * frozen quantizer is the one-shot encode row-for-row (same assign /
  * residualize / PQ-argmin arithmetic, integer throughout), so the
  * served top-k from the accumulated store equals q159's one-shot
  * output for ANY batching — the registered oracle IS q159's SQL, and
  * the spec asserts store ≡ one-shot encode as relations.
  *
  * Scale shape: per batch O(batch · K·Dim) codegen'd map work + an
  * O(batch) append — no term in the accumulated store size; the serve
  * read is q159's cell-bounded plan over the store (broadcast query
  * LUTs, equi-join on the cell id). At 100 TB the store is a parquet
  * relation partitioned by ingest batch; cell-partitioned compaction is
  * a metadata rewrite that never touches the codes. */
object StreamingIndex {

  /** Fold one micro-batch of (vec_id, embedding) into the index store:
    * encode under the frozen quantizer, append under `codes/b=N`. */
  def indexBatch(batch: DataFrame, storeDir: String,
      coarse: Array[Array[Long]], cb: Array[Array[Array[Long]]],
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (Snapshots.committed(spark, s"$storeDir/codes", batchId)) return
    Similarity.ivfAdcEncode(batch, coarse, cb)
      .write.mode("overwrite").parquet(s"$storeDir/codes/b=$batchId")
  }

  /** The accumulated (vec_id, cell, codes) index — committed batches
    * only (the q202 read barrier). */
  def indexTable(spark: SparkSession, storeDir: String): DataFrame = {
    val ids = Snapshots.committedIds(spark, s"$storeDir/codes")
    if (ids.nonEmpty)
      spark.read.parquet(s"$storeDir/codes")
        .filter(col("b").isin(ids: _*)).drop("b")
    else spark.range(0).select(col("id").as("vec_id"),
      col("id").as("cell"), array().cast("array<long>").as("codes"))
  }

  /** Registered q226 entry: the fixture vectors as a 4-chunk
    * file-source stream folded through [[indexBatch]] under the frozen
    * snapshot-trained quantizer, then the q159 query batch served from
    * the ACCUMULATED store — whose oracle is exactly q159's SQL. */
  def streamingIndexServe(spark: SparkSession, dir: String): DataFrame = {
    val storeDir = Snapshots.storeDir(spark, "stream_index_store")
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val (coarse, cb) = Similarity.ivfAdcTrain(emb)
    FileFeed.run(spark, emb, nChunks = 4, col("vec_id"),
      ordered = false, purpose = "index") { (batch, batchId) =>
      indexBatch(batch, storeDir, coarse, cb, batchId)
    }
    Similarity.ivfAdcServe(indexTable(spark, storeDir),
      emb.filter(col("vec_id") % 50 === 0), coarse, cb)
  }
}
