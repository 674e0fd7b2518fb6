package graft.tools

import graft.Tables
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Constrained-memory scale probe for the dedup ACTION tiers — the
  * reference's defining larger-than-memory trait (4 GB of data through a
  * 1 GB buffer pool, `scan_regtest.cpp:7-8,19-20`) applied to the
  * flagship extension operators at amplified scale.
  *
  * Two sequential sessions over the SAME amplified corpus (default 50×
  * sf0.1, `SPARK_GRAFT_AMPLIFY`):
  *
  *  1. baseline — ordinary config; records row counts, action counts
  *     (merges / drops) and an order-independent xxhash64 checksum of
  *     every output row for each operator;
  *  2. constrained — `spark.memory.fraction=0.05` (execution+storage
  *     squeezed to 5% of the heap, real organic pressure) plus
  *     `spark.shuffle.spill.numElementsForceSpillThreshold=200000` so
  *     every external sorter/shuffle writer provably exercises its spill
  *     path regardless of heap headroom; records the same outcomes PLUS
  *     total task spill bytes (memory+disk) from TaskMetrics.
  *
  * PASS = every operator completes under pressure with spill bytes > 0
  * and checksum/count equality with the baseline — spill changed the
  * execution, not the answer. Exit code 4 on any mismatch or zero-spill
  * run (binding thresholds are part of the claim).
  *
  * Operators probed: the q129 fuzzy-dedup keep-list (minhash funnel →
  * escalated pairs → connected components) and the q130 two-level
  * semantic dedup (hierarchical quantizer, K scaled with the corpus).
  */
object PressureSmoke {

  private final case class Outcome(rows: Long, actions: Long, checksum: Long)

  private def session(constrained: Boolean): SparkSession = {
    val b = SparkSession.builder().master("local[32]")
      .appName(if (constrained) "graft-pressure" else "graft-pressure-baseline")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val c = if (constrained)
      b.config("spark.memory.fraction", "0.05")
        .config("spark.shuffle.spill.numElementsForceSpillThreshold", "200000")
    else b
    c.getOrCreate()
  }

  /** Amplified corpus/vectors, mirroring ScaleSmoke: per-copy text
    * mutation (near- but not exact dups — the hard LSH case) and exact
    * embedding copies under shifted ids. */
  private def amplified(spark: SparkSession, dir: String, mult: Int)
      : (DataFrame, DataFrame) = {
    val t = Tables(spark, dir)
    val docs = (0 until mult).map { i =>
      t.documents.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" copyvariant$i tail")).as("text"))
    }.reduce(_ union _)
    val vecs = (0 until mult).map { i =>
      t.embeddings.select(
        (col("vec_id") + lit(i * 10000000L)).as("vec_id"), col("embedding"))
    }.reduce(_ union _)
    (docs, vecs)
  }

  /** Order-independent whole-result fingerprint: XOR-fold of per-row
    * xxhash64 over all columns (XOR cannot overflow under ANSI mode, and
    * both outputs are key-unique so duplicate-row cancellation cannot
    * occur). Column list is fixed by the caller so both sessions hash
    * identical shapes. */
  private def fingerprint(df: DataFrame, cols: Seq[String]): Long =
    df.select(xxhash64(cols.map(col): _*).as("h"))
      .agg(coalesce(expr("bit_xor(h)"), lit(0L))).head().getLong(0)

  private def run(spark: SparkSession, dir: String, mult: Int)
      : Map[String, Outcome] = {
    val (docs, vecs) = amplified(spark, dir, mult)
    val keep = graft.operators.Dedup.fuzzyDedupKeepFrom(spark, docs)
      .persist()
    val keepOut = Outcome(keep.count(),
      keep.filter(col("doc_id") =!= col("canonical_id")).count(),
      fingerprint(keep, Seq("doc_id", "canonical_id")))
    keep.unpersist()
    val sem = graft.operators.Similarity
      .semanticDedupFrom(vecs, 0.35, k = 16 * mult, twoLevel = true)
      .persist()
    val semOut = Outcome(sem.count(),
      sem.filter(!col("kept")).count(),
      fingerprint(sem, Seq("vec_id", "cell", "kept", "escalated")))
    sem.unpersist()
    Map("fuzzy_dedup_keep" -> keepOut, "semantic_dedup_2l" -> semOut)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "50").toInt

    val base = session(constrained = false)
    base.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val baseline = run(base, dir, mult)
    val baseSecs = (System.nanoTime() - t0) / 1e9
    base.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val pressed = session(constrained = true)
    pressed.sparkContext.setLogLevel("WARN")
    val spilled = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          spilled.addAndGet(te.taskMetrics.memoryBytesSpilled +
            te.taskMetrics.diskBytesSpilled)
    }
    pressed.sparkContext.addSparkListener(listener)
    val t1 = System.nanoTime()
    val constrained = run(pressed, dir, mult)
    val pressSecs = (System.nanoTime() - t1) / 1e9
    org.apache.spark.graft.ListenerDrain.drain(pressed.sparkContext)
    val spillBytes = spilled.get()
    pressed.stop()

    var ok = spillBytes > 0
    println(f"[pressure] amplify=${mult}x baseline=${baseSecs}%.1f s " +
      f"constrained=${pressSecs}%.1f s spill_bytes=$spillBytes")
    baseline.keys.toSeq.sorted.foreach { k =>
      val b = baseline(k); val c = constrained(k)
      val eq = b == c
      ok &= eq
      println(s"[pressure] $k: rows=${b.rows} actions=${b.actions} " +
        s"checksum=${b.checksum} constrained_equal=$eq" +
        (if (eq) "" else s" (constrained: $c)"))
    }
    if (spillBytes == 0)
      System.err.println("[pressure] FAIL: constrained run never spilled")
    if (!ok) sys.exit(4)
  }
}
