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

  // ----- index-staleness monitor (q227): the "when to retrain"
  // signal an ANN deployment watches. The quantizer was trained on a
  // snapshot and FROZEN (q226's posture); as ingested data drifts away
  // from that snapshot, new vectors land ever farther from their
  // nearest frozen cell — candidate lists stop matching true
  // neighborhoods and recall decays silently. The monitor prices each
  // micro-batch's fit: per batch, the count / sum / max of the
  // integer distance-to-nearest-frozen-cell, plus how many vectors
  // exceed the calibration threshold (the TRAINING SNAPSHOT's max
  // assignment distance — beyond it a vector is farther from every
  // cell than any training point was, unambiguous out-of-distribution
  // evidence). All additive integers in an append-only stats store
  // (the q202 discipline), so streaming ≡ batch exactly.
  //
  // Overflow envelope: dist_q ≤ Dim·(2·10⁶·maxcomp)² per vector —
  // ≈ 6·10¹⁴ for unit-range 64-dim embeddings at the 2× planted
  // drift — so a batch's sum_dist is Long-safe through ~10⁴ such
  // vectors per batch; ANSI fails fast beyond (the betweenness
  // envelope discipline).

  /** Fold one micro-batch's staleness stats into the store: one
    * argmin map over the batch, a 1-row aggregate under `stats/b=N`
    * (the commit marker; replays no-op). */
  def indexDriftBatch(batch: DataFrame, storeDir: String,
      coarse: Array[Array[Long]], farThreshold: Long,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (Snapshots.committed(spark, s"$storeDir/stats", batchId)) return
    Similarity.assignWithDist(batch, coarse)
      .agg(lit(batchId).as("batch_id"),
        count(lit(1)).as("n_vecs"),
        sum(col("dist_q")).as("sum_dist"),
        max(col("dist_q")).as("max_dist"),
        sum(when(col("dist_q") > farThreshold, lit(1L)).otherwise(lit(0L)))
          .as("n_far"))
      .write.mode("overwrite").parquet(s"$storeDir/stats/b=$batchId")
  }

  /** Current monitor contents: one stats row per committed batch. */
  def indexDriftTable(spark: SparkSession, storeDir: String): DataFrame = {
    val ids = Snapshots.committedIds(spark, s"$storeDir/stats")
    (if (ids.nonEmpty)
       spark.read.parquet(s"$storeDir/stats")
         .filter(col("b").isin(ids: _*)).drop("b")
     else spark.range(0).select(col("id").as("batch_id"),
       col("id").as("n_vecs"), col("id").as("sum_dist"),
       col("id").as("max_dist"), col("id").as("n_far")))
      .orderBy(col("batch_id"))
  }

  /** Registered q227 entry: the coarse quantizer trains on the
    * UNDRIFTED snapshot and calibrates the threshold (snapshot max
    * assignment distance); the stream then carries a PLANTED
    * distribution shift — vectors in the top quarter of the id range
    * (exactly the last of the [[FileFeed.StreamChunks]] ordered
    * vec_id-range chunks) are scaled 2× (exact in float, so the
    * drifted quantization replays in SQL) — and the monitor must price
    * the drifted batch as out-of-distribution while the in-snapshot
    * batches read n_far = 0. */
  def streamingIndexDrift(spark: SparkSession, dir: String): DataFrame = {
    val storeDir = Snapshots.storeDir(spark, "stream_index_drift_store")
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val (coarse, _) = Similarity.ivfAdcTrain(emb)
    val farThreshold = Similarity.assignWithDist(emb, coarse)
      .agg(max(col("dist_q"))).head().getLong(0)
    val nv = emb.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val driftLo = nv * 3L / 4L
    val drifted = emb.select(col("vec_id"),
      transform(col("embedding"), x =>
        x * when(col("vec_id") >= driftLo, lit(2.0f)).otherwise(lit(1.0f)))
        .as("embedding"))
    FileFeed.run(spark, drifted, nChunks = FileFeed.StreamChunks,
      col("vec_id"), ordered = true, purpose = "index_drift") {
      (batch, batchId) =>
        indexDriftBatch(batch, storeDir, coarse, farThreshold, batchId)
    }
    indexDriftTable(spark, storeDir)
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
