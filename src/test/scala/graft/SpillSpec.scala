package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Larger-than-memory behavior: the reference's defining trait is pushing
  * 4 GB of data through a 1 GB buffer pool with clock-sweep page eviction
  * (`scan_regtest.cpp:7-8,19-20`; `buffer_pool.cpp:460-518`). The Spark
  * analogue of "state exceeds the pool" is operator spill-to-disk: a
  * sort/window/join whose buffered state exceeds its memory budget spills
  * to disk and completes with identical results. These specs force REAL
  * spills deterministically — via the operators' spill thresholds, the
  * session-dynamic knob for the exact code path memory pressure triggers
  * (`ExternalAppendOnlyUnsafeRowArray` → `UnsafeExternalSorter`) — and
  * assert BOTH task spill metrics > 0 AND bit-equality with the
  * in-memory run. (`spark.memory.fraction` itself is context-static, so
  * a shared-JVM spec exercises the same spill machinery through the
  * thresholds instead; ScaleSmoke covers organic pressure at 50×.)
  */
class SpillSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Runs `f` and returns (result, bytes spilled by its tasks) — summed
    * memory+disk spill from TaskMetrics. Listener delivery is async;
    * `ListenerDrain.drain` blocks until the bus is empty, so the sum
    * is complete when read (no sleep-poll heuristics). */
  private def withSpillMetrics[A](f: => A): (A, Long) = {
    val spilled = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          spilled.addAndGet(te.taskMetrics.memoryBytesSpilled +
            te.taskMetrics.diskBytesSpilled)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val res = f
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      (res, spilled.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def withConfs[A](kvs: (String, String)*)(f: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("window aggregation spills to disk and stays bit-identical") {
    val q = () => SparkEntry.queries("q23_window_running_sum")(spark, sf)
    val (inMem, noSpill) = withSpillMetrics(q().collect().toSeq)
    assert(noSpill == 0, s"baseline run unexpectedly spilled $noSpill bytes")
    val (spilledRows, bytes) = withConfs(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
      "spark.sql.windowExec.buffer.spill.threshold" -> "8") {
      withSpillMetrics(q().collect().toSeq)
    }
    assert(bytes > 0, "window run never spilled — threshold not binding")
    assert(spilledRows == inMem,
      s"spilled result diverges from in-memory (${spilledRows.length} vs ${inMem.length} rows)")
  }

  test("sort-merge join key-group buffer spills and stays bit-identical") {
    // ~75 filtered orders share each of the 5 priority keys at sf0.001,
    // so a spill threshold of 32 rows forces every buffered key group
    // through the external sorter — the join-side analogue of the scan
    // regtest's pool overflow. (Group size and threshold are balanced:
    // every spilled group re-opens its spill files per probe row with a
    // 1 MB read-ahead buffer each, so MANY tiny spill files OOM the test
    // JVM while a couple per group exercise the same path safely.)
    val t = Tables(spark, sf)
    val orders = t.orders.filter(col("o_orderkey") % 4 === 0)
    def q(): Seq[Row] = {
      val a = orders.select(col("o_orderpriority").as("p"), col("o_orderkey"))
      val b = orders.select(col("o_orderpriority").as("p"), col("o_custkey"))
      val j = a.join(b, "p")
        .groupBy(col("p"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey") + col("o_custkey")).as("s"))
        .orderBy(col("p"))
      // string match: the join sits under an AdaptiveSparkPlan wrapper,
      // which the tree's exists() does not traverse pre-finalization
      assert(j.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
        j.queryExecution.executedPlan.toString)
      j.collect().toSeq
    }
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true") {
      val (inMem, _) = withSpillMetrics(q())
      val (spilled, bytes) = withConfs(
        "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "16",
        "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "32") {
        withSpillMetrics(q())
      }
      assert(bytes > 0, "join run never spilled — threshold not binding")
      assert(spilled == inMem)
    }
  }
}
