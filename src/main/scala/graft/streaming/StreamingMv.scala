package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incrementally-maintained materialized view (q162) — the streaming-
  * warehouse pattern: a (window, event_type) rollup kept current by a
  * `foreachBatch` MERGE against a batch-keyed parquet snapshot store,
  * instead of recomputing the aggregate from history on every refresh.
  * The measures are exact integers (row count + cents), so merge order
  * cannot perturb values: after ANY prefix of the stream the snapshot
  * equals the one-shot batch aggregate over everything ingested so far —
  * the MV invariant, spec-asserted per batch.
  *
  * Exactly-once posture: each batch writes its cumulative snapshot under
  * `mv/b=<batchId>/` with the write's _SUCCESS as commit marker —
  * foreachBatch replays of a committed batch are no-ops, replays of a
  * half-written one overwrite it (the [[Snapshots]] contract shared with
  * the dedup stores); snapshots older than batchId−1 are pruned.
  *
  * Scale shape: per batch, one map-side-combinable delta aggregate over
  * the batch plus a merge keyed by the MV grain — O(batch + MV rows),
  * and the MV is the AGGREGATE (windows × types), orders of magnitude
  * below event history. Nothing ever re-reads ingested events.
  */
object StreamingMv {

  private val WinUs = 600000000L // 10-minute windows, micros

  /** Fold one micro-batch of events into the MV snapshot store. */
  def mvBatch(batch: DataFrame, storeDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val mvDir = s"$storeDir/mv"
    if (Snapshots.committed(spark, mvDir, batchId)) return
    val delta = batch.select(
        expr(s"(unix_micros(ts) div $WinUs) * 600").as("win_start"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("win_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_cents"))
    Snapshots.merge(spark, mvDir, batchId, delta,
        Seq("win_start", "event_type"), Seq("cnt", "sum_cents"))
      .write.mode("overwrite").parquet(s"$mvDir/b=$batchId")
    Snapshots.prune(spark, mvDir, batchId)
  }

  /** Current MV contents (latest committed snapshot; empty if none). */
  def mvTable(spark: SparkSession, storeDir: String): DataFrame =
    Snapshots.latest(spark, s"$storeDir/mv", Long.MaxValue)
      .map(spark.read.parquet(_))
      .getOrElse(spark.range(0).select(col("id").as("win_start"),
        lit("").as("event_type"), lit(0L).as("cnt"), lit(0L).as("sum_cents")))
      .orderBy(col("win_start"), col("event_type"))

  /** Streaming ingest sampling monitor (q189) — q173's deterministic
    * hash-sampling readout maintained incrementally while a corpus
    * streams in: per micro-batch, one source-keyed (docs, sampled)
    * delta merged additively into the snapshot store (integer counts —
    * merge order cannot perturb them), realized per-mille computed at
    * READ time from the merged counts (a ratio is not additive; the
    * counts are). The ops dashboard a production ingest keeps open: a
    * source whose realized rate drifts from the 160‰ target mid-stream
    * signals content duplication or truncation in flight, caught while
    * the crawl is still running instead of at end-of-ingest. Oracle:
    * q173's one-shot SQL over the whole corpus — additive counts make
    * the stream land on it exactly for any batching. */
  def sampleBatch(batch: DataFrame, storeDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val dir = s"$storeDir/smon"
    if (Snapshots.committed(spark, dir, batchId)) return
    val sampled = substring(md5(col("text")), 1, 2) < lit("29")
    val delta = batch.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(sampled, 1L).otherwise(0L)).as("n_sampled"))
    Snapshots.merge(spark, dir, batchId, delta,
        Seq("source"), Seq("n_docs", "n_sampled"))
      .write.mode("overwrite").parquet(s"$dir/b=$batchId")
    Snapshots.prune(spark, dir, batchId)
  }

  /** Current monitor contents (latest committed snapshot). */
  def sampleMonitorTable(spark: SparkSession, storeDir: String): DataFrame =
    Snapshots.latest(spark, s"$storeDir/smon", Long.MaxValue)
      .map(spark.read.parquet(_))
      .getOrElse(spark.range(0).select(lit("").as("source"),
        lit(0L).as("n_docs"), lit(0L).as("n_sampled")))
      .withColumn("realized_pm", expr("1000 * n_sampled div n_docs"))
      .orderBy(col("source"))

  /** Registered q189 entry: the documents as a 4-chunk file-source
    * stream folded through [[sampleBatch]]; returns the final monitor
    * table. */
  def streamingSampleMonitor(spark: SparkSession, dir: String): DataFrame = {
    val storeDir = Snapshots.storeDir(spark, "stream_smon_store")
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), col("text"))
    FileFeed.run(spark, docs, nChunks = 4, col("doc_id"),
      ordered = false, purpose = "smon") { (batch, batchId) =>
      sampleBatch(batch, storeDir, batchId)
    }
    sampleMonitorTable(spark, storeDir)
  }

  /** Streaming contamination monitor (q197) — q117's benchmark-overlap
    * gate maintained while the corpus streams in. Per micro-batch the
    * batch's documents shingle into DISTINCT word-8-grams that probe the
    * broadcast benchmark gram set (a stream-static equi-join is
    * stateless — TextAnalysis.contaminationCounts is literally the batch
    * operator, applied to the micro-batch), and the per-doc overlap
    * counts merge additively into the snapshot store. A document arrives
    * whole in one batch, so its count is final the moment it lands; the
    * additive merge is then trivially batching-invariant and the monitor
    * equals q117's one-shot readout after any prefix — which is why the
    * oracle IS q117's SQL. This is the shape a production ingest wants:
    * a crawl slice that starts quoting an eval suite is flagged
    * mid-stream, not at end-of-ingest.
    *
    * Scale shape: per batch O(batch grams) against a broadcast
    * eval-suite set (fixed size regardless of corpus), merge keyed by
    * the batch's touched doc ids — O(batch + flagged docs), and the
    * store holds only CONTAMINATED docs (the q117 inner-join contract),
    * a vanishing fraction of the corpus. */
  def contamBatch(batch: DataFrame, bench: DataFrame, storeDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val dir = s"$storeDir/contam"
    if (Snapshots.committed(spark, dir, batchId)) return
    val delta = graft.operators.TextAnalysis.contaminationCounts(
      graft.operators.TextAnalysis.docGrams(batch), bench)
    Snapshots.merge(spark, dir, batchId, delta,
        Seq("doc_id"), Seq("n_shared"))
      .write.mode("overwrite").parquet(s"$dir/b=$batchId")
    Snapshots.prune(spark, dir, batchId)
  }

  /** Current monitor contents (latest committed snapshot). */
  def contamTable(spark: SparkSession, storeDir: String): DataFrame =
    Snapshots.latest(spark, s"$storeDir/contam", Long.MaxValue)
      .map(spark.read.parquet(_))
      .getOrElse(spark.range(0).select(col("id").as("doc_id"),
        lit(0L).as("n_shared")))
      .orderBy(col("doc_id"))

  /** Registered q197 entry: the corpus slice (doc_id % 5 <> 0, the q117
    * fixture convention) as a 4-chunk file-source stream folded through
    * [[contamBatch]] against the held-out benchmark gram set, persisted
    * once for the stream's life (eval suites are static; re-shingling
    * them per batch would rescan the benchmark every trigger). */
  def streamingContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    val bench = graft.operators.TextAnalysis
      .docGrams(docs.filter(col("doc_id") % 5 === 0))
      .select(col("g")).distinct().persist()
    try {
      val storeDir = Snapshots.storeDir(spark, "stream_contam_store")
      FileFeed.run(spark, docs.filter(col("doc_id") % 5 =!= 0),
        nChunks = 4, col("doc_id"),
        ordered = false, purpose = "contam") { (batch, batchId) =>
        contamBatch(batch, bench, storeDir, batchId)
      }
      contamTable(spark, storeDir)
    } finally bench.unpersist()
  }

  // ----- streaming tokenizer-drift monitor (q216): the production
  // posture is train-once-freeze (a tokenizer is trained on a corpus
  // snapshot and then SERVES — retraining mid-stream would silently
  // change every downstream token budget), so the operational question
  // becomes "is the live stream drifting away from the tokenizer's
  // training distribution?". The whitespace-vs-BPE expansion ratio per
  // micro-batch IS that detector: vocabulary the frozen merges never
  // saw stays at ~1 token per symbol, so its expansion rises.

  /** Fold one micro-batch into the drift store. Batch 0 trains the
    * [[graft.operators.Bpe]] merge table on ITS OWN documents and
    * freezes it (`merges/`, written before batch 0's commit marker);
    * every batch (0 included) then counts its whitespace and
    * frozen-tokenizer BPE token mass — unseen words encode fine, the
    * merge table is string rules, not a vocabulary lookup — and writes
    * one stats row under `stats/b=N` (the commit marker; replays
    * no-op). Requires the ordered feed (batch 0 must be the lowest
    * doc_id chunk — the q133 ordered-feed discipline). */
  def driftBatch(batch: DataFrame, storeDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (Snapshots.committed(spark, s"$storeDir/stats", batchId)) return
    if (batchId == 0L)
      graft.operators.Bpe
        .trainMerges(graft.operators.Bpe.wordCounts(batch),
          graft.operators.Bpe.BpeMerges)
        .zipWithIndex
        .map { case ((pa, pb, n), i) => (i + 1L, pa, pb, n) }
        .toDF("merge_rank", "pa", "pb", "n")
        .write.mode("overwrite").parquet(s"$storeDir/merges")
    val merges = spark.read.parquet(s"$storeDir/merges")
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val wt = graft.operators.Bpe.wordTokens(
      graft.operators.Bpe.wordCounts(batch), merges)
    val nDocs = batch.count()
    batch.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(wt), Seq("w"), "left")
      .agg(lit(batchId).as("batch_id"), lit(nDocs).as("n_docs"),
        count(lit(1)).as("n_ws_tokens"),
        sum(coalesce(col("n_tok"), lit(1L))).as("n_bpe_tokens"))
      .write.mode("overwrite").parquet(s"$storeDir/stats/b=$batchId")
  }

  /** Current monitor contents: one row per COMMITTED batch (the q202
    * read barrier — a `stats/b=N` dir left by a crash mid-write stays
    * invisible until its replay overwrites it). */
  def driftTable(spark: SparkSession, storeDir: String): DataFrame = {
    val ids = Snapshots.committedIds(spark, s"$storeDir/stats")
    (if (ids.nonEmpty)
       spark.read.parquet(s"$storeDir/stats")
         .filter(col("b").isin(ids: _*)).drop("b")
     else spark.range(0).select(col("id").as("batch_id"),
       col("id").as("n_docs"), col("id").as("n_ws_tokens"),
       col("id").as("n_bpe_tokens")))
      .orderBy(col("batch_id"))
  }

  /** Registered q216 entry: the fixture corpus as a 4-chunk ORDERED
    * file-source stream (deterministic doc_id-range bins, so the
    * oracle can replay the chunking arithmetically) folded through
    * [[driftBatch]]. */
  def streamingTokenDrift(spark: SparkSession, dir: String): DataFrame = {
    val storeDir = Snapshots.storeDir(spark, "stream_drift_store")
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    FileFeed.run(spark, docs, nChunks = FileFeed.StreamChunks,
      col("doc_id"), ordered = true, purpose = "drift") { (batch, batchId) =>
      driftBatch(batch, storeDir, batchId)
    }
    driftTable(spark, storeDir)
  }

  // ----- streaming novelty monitor (q221): the ingest-time formulation
  // of q213 under the q202 store discipline. Each document's distinct
  // word-8-grams are computed exactly ONCE, at ingest; the store
  // accumulates the (doc_id, gram) index plus per-batch gram-count
  // deltas. A document's novelty is corpus-global and NON-monotone (a
  // later copy makes an earlier doc's grams non-novel), so the readout
  // recomputes df by summing the per-batch deltas — the same aggregate
  // the one-shot q213 pays — and joins it back over the stored index
  // without ever re-shingling text. Streaming ≡ batch exactly for any
  // batching, so the oracle is literally q213's SQL.

  /** Fold one micro-batch of (doc_id, text) into the novelty store:
    * distinct-gram index rows under `grams/b=N`, the batch's own gram
    * counts under `gcounts/b=N` (written LAST — the commit marker). */
  def noveltyBatch(batch: DataFrame, storeDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (Snapshots.committed(spark, s"$storeDir/gcounts", batchId)) return
    val g = graft.operators.TextAnalysis.docGrams(batch)
    g.write.mode("overwrite").parquet(s"$storeDir/grams/b=$batchId")
    g.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$storeDir/gcounts/b=$batchId")
  }

  /** Current monitor contents: q213's exact output over everything
    * ingested so far — committed partitions only (the q202 read
    * barrier: the index is written before the commit marker). */
  def noveltyTable(spark: SparkSession, storeDir: String): DataFrame = {
    val committedIds = Snapshots.committedIds(spark, s"$storeDir/gcounts")
    def readCommitted(root: String, emptyLike: => DataFrame): DataFrame =
      if (Snapshots.pathExists(spark, root))
        spark.read.parquet(root)
          .filter(col("b").isin(committedIds: _*)).drop("b")
      else emptyLike.limit(0)
    val g = readCommitted(s"$storeDir/grams",
      spark.range(0).select(col("id").as("doc_id"),
        lit(null).cast("string").as("g")))
    val dfreq = readCommitted(s"$storeDir/gcounts",
        spark.range(0).select(lit(null).cast("string").as("g"),
          col("id").as("n")))
      .groupBy(col("g")).agg(sum(col("n")).as("df"))
    g.join(dfreq, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, lit(1L)).otherwise(lit(0L)))
          .as("n_novel"))
      .withColumn("novelty_pm", expr("n_novel * 1000000 div n_grams"))
      .orderBy(col("doc_id"))
  }

  /** Registered q221 entry: the fixture corpus as a 4-chunk
    * file-source stream folded through [[noveltyBatch]]; the final
    * monitor's oracle is exactly q213's SQL. */
  def streamingNovelty(spark: SparkSession, dir: String): DataFrame = {
    val storeDir = Snapshots.storeDir(spark, "stream_novelty_store")
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    FileFeed.run(spark, docs, nChunks = 4, col("doc_id"),
      ordered = false, purpose = "novelty") { (batch, batchId) =>
      noveltyBatch(batch, storeDir, batchId)
    }
    noveltyTable(spark, storeDir)
  }

  /** Registered q162 entry: the fixture events as a 4-chunk file-source
    * stream (the q133 feed discipline — no driver materialization),
    * folded through [[mvBatch]]; returns the final MV, whose oracle is
    * the plain one-shot SQL aggregate over the whole table. */
  def streamingMv(spark: SparkSession, dir: String): DataFrame = {
    val storeDir = Snapshots.storeDir(spark, "stream_mv_store")
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    FileFeed.run(spark, ev, nChunks = 4, col("event_id"),
      ordered = false, purpose = "mv") { (batch, batchId) =>
      mvBatch(batch, storeDir, batchId)
    }
    mvTable(spark, storeDir)
  }
}
