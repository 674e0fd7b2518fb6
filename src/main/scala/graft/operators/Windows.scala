package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / analytic functions (SURVEY.md §2.e — ABSENT in the reference;
  * supplied by `Window.partitionBy(...).orderBy(...)` + ranking/frame
  * functions).
  *
  * Scale note: every window here partitions by a key (customer / user), so
  * the physical plan is one hash exchange on the partition key + an
  * in-partition sort — no global sort, no skew beyond the key distribution.
  * Ordering keys always end in a unique tiebreaker column so that ranking
  * output is deterministic and oracle-comparable.
  */
object Windows {

  /** row_number: latest order per customer (deduplicate-to-latest — the
    * deterministic version of the reference's first-wins duplicate-key rule,
    * `hashjoin_regtest.cpp:51-53`). */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables(spark, dir).orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_custkey"))
  }

  /** Running (prefix) sum of event value per user in time order. */
  def windowRunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).events
      .withColumn("running", round(sum(col("value")).over(w), 2))
      .select(col("event_id"), col("user_id"), col("running"))
      .orderBy(col("event_id"))
  }

  /** lag: inter-event gap in microseconds per user (sessionization
    * building block). */
  def windowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(spark, dir).events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .select(
        col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - coalesce(col("prev_us"), unix_micros(col("ts"))))
          .as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** Sliding rows frame: moving average of the last 3 orders per customer,
    * computed in exact integer cents (avg of doubles can land on exact
    * half-cent boundaries where engines' rounding of binary doubles
    * legitimately differs — integer arithmetic sidesteps that). */
  def windowMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    Tables(spark, dir).orders
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("mavg_cents",
        (sum(col("cents")).over(w) / count(lit(1)).over(w)).cast("long"))
      .select(col("o_orderkey"), col("o_custkey"), col("mavg_cents"))
      .orderBy(col("o_orderkey"))
  }

  /** Numeric RANGE frame: for each order, the sum (in exact cents) of all
    * same-status orders priced within 10,000 below it — a value-based
    * frame (includes ties), not a row-count frame. */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("cents"))
      .rangeBetween(-1000000L, Window.currentRow)
    Tables(spark, dir).orders
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("near_sum_cents", sum(col("cents")).over(w))
      .select(col("o_orderkey"), col("near_sum_cents"))
      .orderBy(col("o_orderkey"))
  }

  /** Ranking battery: rank / dense_rank / ntile / percent_rank over a
    * global total order (single-partition window — deliberately exercises
    * the unpartitioned path; input is one small dimension table). */
  def windowRanking(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables(spark, dir).customer
      .select(
        col("c_custkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("prank"))
      .orderBy(col("c_custkey"))
  }
}
