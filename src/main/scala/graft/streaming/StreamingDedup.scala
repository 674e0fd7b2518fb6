package graft.streaming

import graft.Tables
import graft.operators.{Dedup, Similarity}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming sibling of the q129 fuzzy-dedup keep-list: the ingest-time
  * formulation of the batch minhash-LSH funnel (Dedup.fuzzyDedupKeepFrom),
  * run per micro-batch against an ACCUMULATING signature store — the
  * stream-static accumulation pattern a production corpus ingest runs via
  * `foreachBatch` (the same pattern the reference covers only as one-shot
  * batch dedup; its streaming surface has no near-dup tier).
  *
  * Per batch of (doc_id, text):
  *  1. minhash signatures + band keys for the NEW docs only — each doc's
  *     shingle explosion is computed exactly once over the stream's life;
  *  2. candidate pairs = new×new band-bucket collisions (ia < ib) plus
  *     new×store collisions (the cross tier) — every unordered pair is
  *     generated in exactly the batch where its LATER doc arrives, so the
  *     accumulated candidate set equals the one-shot batch candidate set
  *     regardless of how the corpus is micro-batched;
  *  3. verify candidates with the batch rule (signature agreement ≥ 32/64)
  *     using signatures from the batch + the store;
  *  4. append verified dup pairs, the new signatures/bands, and ALL new ids
  *     (signable or not) to the store.
  *
  * [[keepList]] then assembles the q129 contract from the store: GraphX
  * connected components over accumulated dup PAIRS only (tiny by
  * construction), canonical = component minimum, every seen doc present.
  * StreamingSpec asserts keepList == batch q129 on a planted-dup corpus
  * split so every planted pair spans micro-batches.
  *
  * Scale shape: the per-batch work is |batch| signature computation plus a
  * band-key equi-join against the store — a shuffle on (band_idx,
  * band_val), never all-pairs. A per-bucket cap (`maxBucket`, counted over
  * store + batch together) skips degenerate hot buckets exactly like the
  * batch BucketGuard; the exact-md5 escalation inside over-cap buckets is
  * deferred to batch compaction (run fuzzyDedupKeepFrom over the stored
  * corpus), which is also where a production pipeline would rewrite the
  * append-only store.
  */
object StreamingDedup {

  private def bandRows(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      posexplode(array((0 until Dedup.NumBands).map(b => col(s"band$b")): _*))
        .as(Seq("band_idx", "band_val")))

  /** Process one micro-batch: emit verified dup pairs vs the accumulated
    * store, then fold the batch into the store. Idempotence across batch
    * REPLAYS is the store's responsibility (a production sink would key
    * appends by batchId; the spec's MemoryStream feed delivers each batch
    * once). */
  def dedupBatch(batch: DataFrame, storeDir: String,
      maxBucket: Int = 1000): Unit = {
    val spark = batch.sparkSession
    val sigsPath = s"$storeDir/sigs"
    val idsPath = s"$storeDir/ids"
    val pairsPath = s"$storeDir/pairs"
    val haveStore = new java.io.File(sigsPath).exists
    val sigs = Dedup.minhashSignatures(batch).persist()
    try {
      val newBands = bandRows(sigs)
      val oldSigs =
        if (haveStore) spark.read.parquet(sigsPath)
        else sigs.limit(0)
      val oldBands = bandRows(oldSigs)
      // BucketGuard, accumulated: bucket population = store + this batch
      val hotKeys = newBands.unionByName(oldBands)
        .groupBy(col("band_idx"), col("band_val"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > maxBucket)
        .select(col("band_idx"), col("band_val"))
      val kept = newBands.join(hotKeys, Seq("band_idx", "band_val"),
        "left_anti")
      val keptOld = oldBands.join(hotKeys, Seq("band_idx", "band_val"),
        "left_anti")
      val within = kept.alias("x").join(kept.alias("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib"))
      val cross = kept.alias("x").join(keptOld.alias("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val"))
        .select(least(col("x.doc_id"), col("y.doc_id")).as("ia"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("ib"))
      val cand = within.unionByName(cross).distinct()
      val allSigs = sigs.select(col("doc_id"), col("sig"))
        .unionByName(oldSigs.select(col("doc_id"), col("sig")))
      val dupPairs = cand
        .join(allSigs.select(col("doc_id").as("ia"), col("sig").as("sa")),
          Seq("ia"))
        .join(allSigs.select(col("doc_id").as("ib"), col("sig").as("sb")),
          Seq("ib"))
        .select(col("ia"), col("ib"),
          size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y),
            x => x)).as("agree"))
        .filter(col("agree") >= Dedup.NumHashes / 2)
        .select(col("ia"), col("ib"))
      dupPairs.write.mode("append").parquet(pairsPath)
      sigs.write.mode("append").parquet(sigsPath)
      batch.select(col("doc_id")).write.mode("append").parquet(idsPath)
    } finally sigs.unpersist()
  }

  /** Assemble the keep-list from the accumulated store — same output
    * contract as batch q129: (doc_id, canonical_id), every seen doc
    * present, canonical = min doc_id of the near-dup component. */
  def keepList(spark: SparkSession, storeDir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$storeDir/ids")
    val pairsPath = s"$storeDir/pairs"
    val pairs =
      if (new java.io.File(pairsPath).exists) spark.read.parquet(pairsPath)
      else spark.range(0).select(col("id").as("ia"), col("id").as("ib"))
    val comp = org.apache.spark.graphx.Graph
      .fromEdgeTuples(pairs.as[(Long, Long)].rdd, defaultValue = 0)
      .connectedComponents().vertices
      .map { case (id, c) => (id, c) }
      .toDF("doc_id", "comp")
    ids.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("canonical_id"))
      .orderBy(col("doc_id"))
  }

  /** Registered q133 entry: feed the fixture corpus through a real
    * micro-batched stream (4 chunks — every planted near-dup pair in the
    * fixture spans chunks of the doc_id-ordered feed), run the per-batch
    * incremental dedup, and return the assembled keep-list. Oracle: the
    * SAME recursive-CTE replay as q129 — the streaming formulation must
    * land on the identical keep-list. */
  def streamingKeepList(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_stream_keep").toString
    val feed = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    // MemoryStream feed = harness plumbing so the streaming path is
    // replayable under the DuckDB oracle (driver-side by nature, fixture
    // scale); production attaches dedupBatch to a real readStream source.
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = ms.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dedupBatch(batch, storeDir); ()
      }
      .start()
    try {
      val chunk = math.max(1, (feed.size + 3) / 4)
      feed.grouped(chunk).foreach { c =>
        ms.addData(c); q.processAllAvailable()
      }
    } finally q.stop()
    keepList(spark, storeDir)
  }

  // ----- streaming SemDeDup (q135): the embedding sibling of the minhash
  // keep-list above. Sound for the same reason: the batch drop rule is
  // per-PAIR (drop the HIGHER id of any within-cell cosine ≥ tau pair),
  // which is feed-order-independent — every unordered pair is evaluated
  // in exactly the micro-batch where its later vector arrives, so the
  // accumulated drop set equals the one-shot batch drop set. The
  // quantizer (centroid set) is trained/frozen BEFORE the stream starts
  // (standard SemDeDup/IVF ingest posture), so assignment is identical
  // across batches.

  /** Process one micro-batch of (vec_id, embedding): assign cells against
    * the frozen centroids, emit drops vs the accumulating assignment
    * store, fold the batch in. Cells whose ACCUMULATED population exceeds
    * `maxCell` are skipped from the pairwise compare from that batch on
    * (the batch hot-cell guard applied incrementally); their exact-dup
    * escalation is deferred to batch compaction, the same posture as the
    * minhash tier's over-cap escalation. */
  def semanticBatch(batch: DataFrame, storeDir: String,
      cents: Array[Array[Double]], tau: Double,
      maxCell: Int = 1000): Unit = {
    val spark = batch.sparkSession
    val asgPath = s"$storeDir/asg"
    val dropPath = s"$storeDir/dropped"
    val haveStore = new java.io.File(asgPath).exists
    val asg = Similarity.assignCellsFlatAuto(batch, cents).persist()
    try {
      val old =
        if (haveStore) spark.read.parquet(asgPath)
        else asg.limit(0)
      val hotCells = asg.select(col("cell")).unionByName(old.select(col("cell")))
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .filter(col("n") > maxCell)
        .select(col("cell"))
      val newIn = asg.join(hotCells, Seq("cell"), "left_anti")
      val oldIn = old.join(hotCells, Seq("cell"), "left_anti")
      val within = newIn.alias("a").join(newIn.alias("b"),
          col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
        .filter(Similarity.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")) >= tau)
        .select(col("b.vec_id").as("vec_id"))
      val cross = newIn.alias("a").join(oldIn.alias("b"),
          col("a.cell") === col("b.cell"))
        .filter(Similarity.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")) >= tau)
        .select(greatest(col("a.vec_id"), col("b.vec_id")).as("vec_id"))
      within.unionByName(cross).distinct()
        .write.mode("append").parquet(dropPath)
      asg.write.mode("append").parquet(asgPath)
    } finally asg.unpersist()
  }

  /** Assemble the decision table from the accumulated store — same output
    * contract as batch q128: (vec_id, cell, kept, escalated), one row per
    * non-zero-norm vector; `escalated` marks cells over `maxCell` in the
    * FINAL accumulated state. */
  def semanticDecisionTable(spark: SparkSession, storeDir: String,
      maxCell: Int = 1000): DataFrame = {
    val asg = spark.read.parquet(s"$storeDir/asg")
    val dropPath = s"$storeDir/dropped"
    val dropped =
      if (new java.io.File(dropPath).exists)
        spark.read.parquet(dropPath).distinct()
          .withColumn("_drop", lit(true))
      else spark.range(0).select(col("id").as("vec_id"),
        lit(true).as("_drop"))
    val hotCells = asg.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxCell)
      .select(col("cell").cast("long").as("cell"), lit(true).as("_esc"))
    asg.select(col("vec_id"), col("cell").cast("long").as("cell"))
      .join(dropped, Seq("vec_id"), "left")
      .join(hotCells, Seq("cell"), "left")
      .select(col("vec_id"), col("cell"), col("_drop").isNull.as("kept"),
        coalesce(col("_esc"), lit(false)).as("escalated"))
      .orderBy(col("vec_id"))
  }

  /** Registered q135 entry: freeze the quantizer over the fixture corpus
    * (the K=16 lowest-id vectors — identical to batch q128's), feed the
    * corpus through a real micro-batched stream in 4 chunks, run the
    * per-batch incremental compare, and return the assembled decision
    * table. Oracle: the SAME replay as q128. */
  def streamingSemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vecs = Tables(spark, dir).embeddings
    val cents = Similarity.centroidDirs(vecs, 16)
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_stream_sem").toString
    // Driver-side MemoryStream feed — same harness plumbing note as
    // streamingKeepList above.
    val feed = vecs.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val q = ms.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        semanticBatch(batch, storeDir, cents, 0.35); ()
      }
      .start()
    try {
      val chunk = math.max(1, (feed.size + 3) / 4)
      feed.grouped(chunk).foreach { c =>
        ms.addData(c); q.processAllAvailable()
      }
    } finally q.stop()
    semanticDecisionTable(spark, storeDir)
  }
}
