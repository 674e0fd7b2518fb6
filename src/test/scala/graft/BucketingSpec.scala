package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed (pre-partitioned) tables — the co-located join strategy for
  * repeated large-table joins at cluster scale: both sides bucketed on the
  * join key into the same bucket count join with NO exchange at query
  * time (the shuffle is paid once at write time). This is the Spark
  * analogue of the reference's NUMA-partitioned data placement
  * (`buffer_pool.h:302-325`).
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_warehouse").toString
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val t = Tables(s, sf)
    t.lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b")
      .saveAsTable("lineitem_b")
    t.orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b")
      .saveAsTable("orders_b")
    val joined = s.table("lineitem_b")
      .join(s.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must need no exchange (bucket layout satisfies the
    // distribution requirement); only the final groupBy may shuffle
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"),
      s"join re-shuffled despite bucketing:\n$plan")
    assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"join re-shuffled despite bucketing:\n$plan")
    // and the result matches the unbucketed computation
    val want = t.lineitem.join(t.orders,
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-6) }
  }
}
