package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage (SURVEY §2.a): the engine must read/write the
  * formats a pipeline meets — parquet (primary), orc, csv, json, text —
  * and use partitioned layouts with partition pruning.
  */
class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv sink/source roundtrip preserves rows") {
    val dir = tmp("graft_csv")
    val orders = Tables(spark, sf).orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    orders.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(orders.schema).csv(dir)
    assert(back.count() == orders.count())
    assert(math.abs(back.agg(sum("o_totalprice")).head().getDouble(0) -
      orders.agg(sum("o_totalprice")).head().getDouble(0)) < 1e-4)
  }

  test("json sink/source roundtrip preserves rows") {
    val dir = tmp("graft_json")
    val docs = Tables(spark, sf).documents
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.count() == docs.count())
    assert(back.select(sum(length(col("text")))).head().getLong(0) ==
      docs.select(sum(length(col("text")))).head().getLong(0))
  }

  test("orc sink/source roundtrip preserves rows and sums") {
    // second columnar format (built-in ORC writer/reader) — same
    // predicate-pushdown/column-pruning machinery as parquet
    val dir = tmp("graft_orc")
    val li = Tables(spark, sf).lineitem
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == li.count())
    assert(back.agg(sum(round(col("l_quantity") * 100).cast("long"))).head().getLong(0) ==
      li.agg(sum(round(col("l_quantity") * 100).cast("long"))).head().getLong(0))
    val pushed = back.filter(col("l_returnflag") === "R")
    assert(pushed.queryExecution.executedPlan.toString.contains("PushedFilters"),
      "no pushed filter on the ORC scan")
  }

  test("text source reads lines") {
    val dir = tmp("graft_text")
    Tables(spark, sf).documents.select(col("text")).write.mode("overwrite").text(dir)
    assert(spark.read.text(dir).count() == 500)
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = tmp("graft_part")
    Tables(spark, sf).orders.write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderstatus"), s"no partition pruning in:\n$plan")
    val want = Tables(spark, sf).orders.filter(col("o_orderstatus") === "F").count()
    assert(pruned.count() == want)
  }

  test("schema catalog: saveAsTable + spark.catalog round-trip") {
    // parity with the reference's persisted type catalog (schema.cpp:26-146):
    // register a table in the catalog, read it back by name, verify the
    // schema survived, then drop it.
    spark.sql("DROP TABLE IF EXISTS graft_orders_cat")
    val orders = Tables(spark, sf).orders
    orders.write.mode("overwrite").saveAsTable("graft_orders_cat")
    assert(spark.catalog.tableExists("graft_orders_cat"))
    val cols = spark.catalog.listColumns("graft_orders_cat")
      .collect().map(c => c.name -> c.dataType).toMap
    val want = orders.schema.fields.map(f =>
      f.name -> f.dataType.simpleString).toMap
    assert(cols == want, s"catalog columns $cols != source schema $want")
    val back = spark.table("graft_orders_cat")
    assert(back.count() == orders.count())
    assert(back.except(orders).isEmpty && orders.except(back).isEmpty)
    spark.sql("DROP TABLE graft_orders_cat")
    assert(!spark.catalog.tableExists("graft_orders_cat"))
  }

  test("edge-list text source roundtrip (loadgraph parity)") {
    // parity with the reference's whitespace edge-list reader
    // (loadgraph_regtest.cpp:39-68): header line + src dst pairs
    val dir = tmp("graft_edges")
    val edges = graft.operators.GraphOps.directedEdges(Tables(spark, sf))
    edges.select(concat_ws(" ", col("src"), col("dst")).as("value"))
      .write.mode("overwrite").text(dir)
    val back = spark.read.text(dir)
      .select(split(col("value"), " ").as("parts"))
      .select(element_at(col("parts"), 1).cast("long").as("src"),
        element_at(col("parts"), 2).cast("long").as("dst"))
    assert(back.count() == edges.count())
    assert(back.except(edges).isEmpty && edges.except(back).isEmpty)
  }
}
