package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted join (SURVEY §7 phase 5; "salting for skew" in
  * the design brief).
  *
  * When one join key carries a disproportionate share of rows, a plain
  * shuffle join puts that key's whole partition on one task. Salting
  * splits the hot key S ways: the fact side gets a deterministic salt in
  * [0, S), the dimension side is replicated S× (one row per salt), and
  * the join runs on (key, salt) — the hot key now spreads over S tasks.
  * AQE's skew-join splitting does this adaptively for sort-merge joins;
  * the explicit form here also covers aggregations-after-join and engines
  * without AQE.
  *
  * The demo fabricates skew (half the event keys collapse onto key 0) so
  * the oracle can recompute the same join in plain SQL — salting is pure
  * implementation, invisible in the result.
  */
object Skew {

  private val S = 8 // salt fan-out

  def saltedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    // fabricated skew: keys 0..24 of every 50 collapse to hot key 0
    val fact = ev.select(
      when(col("user_id") % 50 < 25, 0L).otherwise(col("user_id")).as("k"),
      col("value"), col("event_id"))
    val dim = fact.select(col("k")).distinct()
      .withColumn("w", (col("k") % 7).cast("long"))
    val factSalted = fact.withColumn("salt", pmod(col("event_id"), lit(S.toLong)))
    val dimSalted = dim.withColumn("salt",
      explode(sequence(lit(0L), lit(S.toLong - 1))))
    factSalted.join(dimSalted, Seq("k", "salt"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value")), 2).as("sum_value"),
        max(col("w")).as("w"))
      .orderBy(col("k"))
  }
}
