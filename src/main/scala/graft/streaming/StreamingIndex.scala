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
    * only (the q202 read barrier), deduplicated on vec_id keeping the
    * LATEST committed batch's row: a vec_id re-ingested in two batches
    * (an overlapping replay, or an upstream re-embed) must serve ONCE,
    * at its newest encoding — without the dedup ivfAdcServe would rank
    * the stale duplicate at a second rank and silently corrupt the
    * served top-k. Encoding is deterministic under the frozen
    * quantizer, so for exact replays the kept row is byte-identical to
    * the dropped one and the q226 oracle (q159's one-shot SQL) holds
    * for ANY batching, overlapping or not. Cost: one vec_id-keyed
    * window over the store per read — at 100 TB this is what
    * cell-partitioned compaction materializes away (rewrite keeping
    * max b per vec_id, then reads skip the window); the logical
    * contract is the same either way. */
  def indexTable(spark: SparkSession, storeDir: String): DataFrame = {
    val ids = Snapshots.committedIds(spark, s"$storeDir/codes")
    if (ids.nonEmpty) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("b").desc)
      spark.read.parquet(s"$storeDir/codes")
        .filter(col("b").isin(ids: _*))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("b", "__rn")
    } else spark.range(0).select(col("id").as("vec_id"),
      col("id").as("cell"), array().cast("array<long>").as("codes"))
  }

  /** Write one compaction snapshot under the [[Snapshots]]
    * commit-marker convention — versioned `compact/b=<v>/` dirs whose
    * `_SUCCESS` is the commit. The batch ingests already follow this
    * discipline; the compaction rewrite — the ONE operation that
    * touches the whole store — must too: a bare `compact/` overwrite
    * that dies mid-rewrite on an object store leaves a partial dir a
    * later serve would trust. Here a crashed rewrite leaves an
    * UNcommitted `b=v` that readers never see (they fall back to the
    * uncompacted path) and the next compaction overwrites. Older
    * committed snapshots are pruned only AFTER the new one commits. */
  private def writeCompactSnapshot(spark: SparkSession,
      compactRoot: String, df: DataFrame): Unit = {
    val next = Snapshots.committedIds(spark, compactRoot)
      .sorted.lastOption.map(_ + 1).getOrElse(0L)
    df.write.mode("overwrite").parquet(s"$compactRoot/b=$next")
    Snapshots.prune(spark, compactRoot, next + 1)
  }

  /** The latest COMMITTED compaction snapshot, if any — the read-side
    * barrier: a half-written rewrite (no _SUCCESS) stays invisible. */
  private def committedCompact(spark: SparkSession,
      compactRoot: String): Option[DataFrame] =
    Snapshots.latest(spark, compactRoot, Long.MaxValue)
      .map(spark.read.parquet(_))

  /** Compact the dense index store: ONE rewrite that materializes the
    * per-read vec_id dedup ([[indexTable]]'s window) into a
    * commit-markered `compact/b=<v>/` snapshot — the maintenance job
    * an accumulating store needs so SERVE reads stop paying the dedup
    * shuffle (at 100 TB this is the cell-partitioned metadata rewrite
    * the module doc promises: it touches codes rows once and never
    * re-encodes). */
  def compactIndex(spark: SparkSession, storeDir: String): Unit =
    writeCompactSnapshot(spark, s"$storeDir/compact",
      indexTable(spark, storeDir))

  /** The compacted (vec_id, cell, codes) relation — already deduped,
    * no window on the read path. Falls back to the UNcompacted
    * [[indexTable]] (same logical contract, dedup window paid
    * per-read) when no compaction has COMMITTED — a crashed rewrite
    * degrades to the slow path, never to a partial store. */
  def compactTable(spark: SparkSession, storeDir: String): DataFrame =
    committedCompact(spark, s"$storeDir/compact")
      .getOrElse(indexTable(spark, storeDir))

  /** Registered q234 entry: q226's ingest PLUS an overlapping replay
    * (a third of the corpus re-ingested under a later batch id — the
    * duplicate-bearing store compaction exists for), then one
    * compaction rewrite, then the q159 query batch served from the
    * COMPACTED store. Frozen-quantizer encoding is deterministic, so
    * the replayed rows are byte-identical to the originals, the
    * compacted store equals the one-shot encode, and the oracle is
    * exactly q159's SQL — the spec additionally pins that compaction
    * strictly shrank the raw store. */
  def streamingIndexCompact(spark: SparkSession, dir: String): DataFrame = {
    val storeDir = Snapshots.storeDir(spark, "stream_index_compact_store")
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val (coarse, cb) = Similarity.ivfAdcTrain(emb)
    FileFeed.run(spark, emb, nChunks = 4, col("vec_id"),
      ordered = false, purpose = "index_compact") { (batch, batchId) =>
      indexBatch(batch, storeDir, coarse, cb, batchId)
    }
    indexBatch(emb.filter(pmod(col("vec_id"), lit(3)) === 1),
      storeDir, coarse, cb, 100L)
    compactIndex(spark, storeDir)
    Similarity.ivfAdcServe(compactTable(spark, storeDir),
      emb.filter(col("vec_id") % 50 === 0), coarse, cb)
  }

  // ----- streaming LEXICAL index ingest (q233): the BM25 sibling of
  // the dense ingest above — the other half of the hybrid serving
  // tier (q230) has the same maintenance problem. New documents
  // arrive as micro-batches; each batch pays one chunk-explode +
  // (chunk, term) count over ITS OWN rows and appends posting rows
  // under `postings/b=N` (the commit-marker discipline). The corpus
  // statistics BM25 needs are all reconstructible from the union —
  // tf and chunk length are within-chunk facts carried on the rows;
  // df, N, and avgdl are sums over the accumulated relation — so
  // serving from the store equals the one-shot q229 ranking
  // row-for-row for ANY batching: the registered oracle IS q229's
  // SQL. No quantizer, so unlike the dense side there is nothing to
  // freeze and nothing goes stale (q227 has no lexical analogue —
  // idf drifts with the corpus BY DEFINITION and the serve recomputes
  // it from the accumulated stats at read time).
  //
  // Scale shape: per batch O(batch token mass) map work + an
  // O(batch postings) append — no term in store size; the serve read
  // is q229's bounded scoring join re-rooted on the store (df/idf
  // stay vocabulary-scale, the query-term bound caps the posting
  // join). At 100 TB the store is a term-bucketed parquet relation;
  // the per-read dedup window is what posting compaction
  // materializes away (same contract as the dense store's).

  /** Fold one micro-batch of (doc_id, text) documents into the
    * lexical index store: chunk, explode, count — the batch's own
    * posting rows only — appended under `postings/b=N` (replays
    * no-op). */
  def lexIndexBatch(batch: DataFrame, storeDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (Snapshots.committed(spark, s"$storeDir/postings", batchId)) return
    // layout: postings land term-grouped and impact-ordered WITHIN the
    // term (tf desc, len asc — monotone in the serve-time impact for a
    // fixed term up to the global idf/avgdl factors, which only exist
    // at read time as union stats), so the serve's per-term
    // top-[[operators.TextAnalysis.Bm25PostingBound]] prune reads a
    // prefix-shaped row-group pattern instead of a full-list shuffle
    graft.operators.TextAnalysis.bm25Postings(batch)
      .sortWithinPartitions(col("t"), col("tf").desc, col("len"))
      .write.mode("overwrite").parquet(s"$storeDir/postings/b=$batchId")
  }

  /** The accumulated (cid, len, t, tf) posting relation — committed
    * batches only, deduplicated per CHUNK on the latest committed
    * batch (a re-ingested document must not double-count its tf or
    * df — the indexTable rule, keyed on cid because a chunk's posting
    * rows move together). */
  def lexIndexTable(spark: SparkSession, storeDir: String): DataFrame = {
    val ids = Snapshots.committedIds(spark, s"$storeDir/postings")
    if (ids.nonEmpty) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cid"))
      spark.read.parquet(s"$storeDir/postings")
        .filter(col("b").isin(ids: _*))
        .withColumn("__maxb", max(col("b")).over(w))
        .filter(col("b") === col("__maxb"))
        .drop("b", "__maxb")
    } else spark.range(0).select(col("id").as("cid"),
      col("id").as("len"), col("id").cast("string").as("t"),
      col("id").as("tf"))
  }

  /** Registered q233 entry: the documents table as a 4-chunk
    * file-source stream folded through [[lexIndexBatch]], then the
    * q229 query batch served from the ACCUMULATED posting store —
    * whose oracle is exactly q229's SQL. */
  def streamingLexServe(spark: SparkSession, dir: String): DataFrame = {
    val storeDir = Snapshots.storeDir(spark, "stream_lex_store")
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    FileFeed.run(spark, docs, nChunks = 4, col("doc_id"),
      ordered = false, purpose = "lex_index") { (batch, batchId) =>
      lexIndexBatch(batch, storeDir, batchId)
    }
    graft.operators.TextAnalysis
      .bm25TopKFromPostings(lexIndexTable(spark, storeDir))
  }

  /** One-time lexical posting compaction (q246) — the WAND story's
    * last move: the accumulated store (per-read dedup window + the
    * two-phase impact-rank prune paid on EVERY serve) is rewritten
    * once as the deduplicated posting relation ANNOTATED with the
    * materialized (impact, prk) prefix
    * ([[graft.operators.TextAnalysis.bm25AnnotatePostings]] — every
    * row kept so df/N/avgdl remain reconstructible; the kept prefix
    * carries its rank, pruned rows null). Serves thereafter FILTER
    * `prk <= bound` — a pushed-down column predicate over a store
    * laid out (t, prk)-sorted — instead of re-running dedup + two
    * windows per read. The annotation computes over the full
    * accumulated corpus with the same stats a serve derives, so the
    * stored prefix equals the serve-time prune exactly and the served
    * ranking — hence the oracle — is unchanged. */
  def compactLexIndex(spark: SparkSession, storeDir: String): Unit =
    writeCompactSnapshot(spark, s"$storeDir/compact",
      graft.operators.TextAnalysis
        .bm25AnnotatePostings(lexIndexTable(spark, storeDir))
        .sortWithinPartitions(col("t"),
          coalesce(col("prk"), lit(Long.MaxValue))))

  /** The compacted annotated posting relation — deduped, rank
    * materialized, no window on the read path. Falls back to the
    * UNcompacted [[lexIndexTable]] (per-read dedup window + inline
    * two-phase rank — same served ranking, slow path) when no
    * compaction has COMMITTED. */
  def compactLexTable(spark: SparkSession, storeDir: String): DataFrame =
    committedCompact(spark, s"$storeDir/compact")
      .getOrElse(lexIndexTable(spark, storeDir))

  /** Registered q246 entry: q233's ingest PLUS an overlapping replay
    * (a third of the corpus re-ingested under a later batch id — the
    * duplicate mass compaction exists for), then one compaction
    * rewrite materializing the dedup AND the impact-rank prefix, then
    * the q229 query batch served from the compacted store through the
    * stored-rank fast path. Posting building is deterministic, so the
    * replayed rows dedup to the one-shot relation, the annotated
    * prune equals the inline one, and the oracle is exactly q229's
    * SQL — the spec additionally pins the fast path's parity and that
    * the stored prefix respects the bound. */
  def streamingLexCompactServe(spark: SparkSession, dir: String): DataFrame = {
    val storeDir = Snapshots.storeDir(spark, "stream_lex_compact_store")
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    FileFeed.run(spark, docs, nChunks = 4, col("doc_id"),
      ordered = false, purpose = "lex_compact") { (batch, batchId) =>
      lexIndexBatch(batch, storeDir, batchId)
    }
    lexIndexBatch(docs.filter(pmod(col("doc_id"), lit(3)) === 1),
      storeDir, 100L)
    compactLexIndex(spark, storeDir)
    graft.operators.TextAnalysis
      .bm25TopKFromPostings(compactLexTable(spark, storeDir))
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
    * distribution shift — vectors in EXACTLY the last of the
    * [[FileFeed.StreamChunks]] ordered vec_id-range chunks are scaled
    * 2× (exact in float, so the drifted quantization replays in SQL) —
    * and the monitor must price the drifted batch as
    * out-of-distribution while the in-snapshot batches read n_far = 0.
    * The drift boundary is DERIVED FROM THE FEED'S OWN BIN ARITHMETIC
    * (lo + (N−1)·w with w = (hi−lo)//N + 1 — [[FileFeed]]'s ordered
    * value-range bins), not an independent "top quarter" formula, so
    * the planted shift aligns with the last chunk for ANY vec_id
    * range, not just the 0-based count-divisible fixture; the oracle
    * replays the same arithmetic. */
  def streamingIndexDrift(spark: SparkSession, dir: String): DataFrame = {
    val storeDir = Snapshots.storeDir(spark, "stream_index_drift_store")
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val (coarse, _) = Similarity.ivfAdcTrain(emb)
    val fr = Similarity.assignWithDist(emb, coarse)
      .agg(max(col("dist_q"))).head()
    require(!fr.isNullAt(0),
      "streamingIndexDrift: empty embeddings relation — no calibration " +
        "distances to derive the far threshold from")
    val farThreshold = fr.getLong(0)
    val mm = emb.agg(min(col("vec_id")), max(col("vec_id"))).head()
    require(!mm.isNullAt(0),
      "streamingIndexDrift: empty embeddings relation — no vec_id range " +
        "to derive the feed's bin arithmetic from")
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val binW = (hi - lo) / FileFeed.StreamChunks + 1L
    val driftLo = lo + (FileFeed.StreamChunks - 1L) * binW
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

  /** Refresh trigger denominator (q237) — refresh when the NEWEST
    * batch's out-of-threshold fraction exceeds half:
    * n_far · RefreshFarDen > n_vecs. Majority-OOD is unambiguous
    * retrain evidence (the q227 planted drift flags 100%); a
    * production deployment tunes this against its recall SLO. */
  private[graft] val RefreshFarDen = 2L

  /** Drift-triggered index refresh (q237) — closing the loop the
    * q226/q227 pair leaves open: q226 ingests under a FROZEN
    * quantizer, q227 prices how stale that snapshot has become, and
    * this rung acts on the signal. The stream folds BOTH stores per
    * batch (codes under the frozen quantizer + the drift stats — one
    * extra argmin map per batch); after ingest, the newest committed
    * stats row (1 metadata row) decides: if its far fraction clears
    * [[RefreshFarDen]], the quantizer RETRAINS on the accumulated
    * corpus and the index is REBUILT in one encode rewrite under
    * `refresh/` (never an incremental patch — retraining moves every
    * stored code, so the rebuild is the only correct shape); otherwise
    * the frozen-quantizer store serves as in q226. Deterministic
    * training + encoding make the refreshed serve equal the ONE-SHOT
    * index built on the drifted corpus row-for-row, so the oracle is
    * q159's SQL re-rooted on the drifted relation — the whole
    * monitor→trigger→retrain→rebuild→serve policy carries a DuckDB
    * oracle.
    *
    * Scale shape: ingest stays O(batch) per batch (two map passes +
    * two appends, no store-size term); the decision reads ONE stats
    * row; the refresh pays what the initial build paid — training
    * (sample-bounded) + one corpus encode pass + one rewrite — which
    * is the floor for a correct retrain, amortized over every serve
    * until the next trigger. In production the retrain reads the raw
    * vector relation (the lake table the stream also feeds); here that
    * relation is the stream's own source. */
  def streamingIndexRefresh(spark: SparkSession, dir: String): DataFrame = {
    val storeDir = Snapshots.storeDir(spark, "stream_index_refresh_store")
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    // the q227 planted shift, aligned to the feed's own bin arithmetic
    val mm = emb.agg(min(col("vec_id")), max(col("vec_id"))).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val binW = (hi - lo) / FileFeed.StreamChunks + 1L
    val driftLo = lo + (FileFeed.StreamChunks - 1L) * binW
    val drifted = emb.select(col("vec_id"),
      transform(col("embedding"), x =>
        x * when(col("vec_id") >= driftLo, lit(2.0f)).otherwise(lit(1.0f)))
        .as("embedding"))
    indexRefreshServe(spark, emb, drifted, storeDir)
  }

  /** The policy over arbitrary relations: `snapshot` trains the frozen
    * quantizer and calibrates the threshold; `stream` is what actually
    * arrives (drifted or not). Returns the served q159 query batch
    * from whichever index the policy picked. */
  private[graft] def indexRefreshServe(spark: SparkSession,
      snapshot: DataFrame, stream: DataFrame,
      storeDir: String): DataFrame = {
    val (coarse, cb) = Similarity.ivfAdcTrain(snapshot)
    val fr = Similarity.assignWithDist(snapshot, coarse)
      .agg(max(col("dist_q"))).head()
    require(!fr.isNullAt(0),
      "indexRefreshServe: empty snapshot relation — no calibration " +
        "distances to derive the far threshold from")
    val farThreshold = fr.getLong(0)
    FileFeed.run(spark, stream, nChunks = FileFeed.StreamChunks,
      col("vec_id"), ordered = true, purpose = "index_refresh") {
      (batch, batchId) =>
        indexBatch(batch, storeDir, coarse, cb, batchId)
        indexDriftBatch(batch, storeDir, coarse, farThreshold, batchId)
    }
    val lastRows = indexDriftTable(spark, storeDir)
      .orderBy(col("batch_id").desc).limit(1).collect()
    require(lastRows.nonEmpty,
      "indexRefreshServe: the drift store has no committed batches — " +
        "the feed wrote nothing, so there is no drift stat to decide on")
    val last = lastRows(0)
    val queries = stream.filter(col("vec_id") % 50 === 0)
    if (last.getAs[Long]("n_far") * RefreshFarDen >
        last.getAs[Long]("n_vecs")) {
      val (c2, cb2) = Similarity.ivfAdcTrain(stream)
      Similarity.ivfAdcEncode(stream, c2, cb2)
        .write.mode("overwrite").parquet(s"$storeDir/refresh")
      Similarity.ivfAdcServe(
        spark.read.parquet(s"$storeDir/refresh"), queries, c2, cb2)
    } else
      Similarity.ivfAdcServe(indexTable(spark, storeDir), queries,
        coarse, cb)
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
