package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Specialized join shapes Spark has no single operator for (SURVEY §2.c
  * lists them ABSENT in the reference and composable here): as-of and
  * range joins, built scale-first.
  *
  * - As-of: the union + keyed-window formulation — one shuffle on the key,
  *   no inequality join at all. This is the standard trick for
  *   "latest value at or before t" at any scale (an inequality join would
  *   be quadratic per key; the window is linear after one sort).
  * - Range: bin both sides to a coarse equi-key (month), equi-join on the
  *   bin, then apply the precise range predicate — turning an unbounded
  *   theta join into a shuffle join whose skew is bounded by bin width.
  */
object Joins {

  /** As-of join: for every purchase event, the most recent signup of the
    * same user at or before the purchase time (null if none). Implemented
    * as union + per-user RANGE window, so ties at equal timestamps match
    * DuckDB's `ASOF JOIN (p.ts >= l.ts)` semantics exactly. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .filter(col("event_type").isin("purchase", "signup"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("signup_ts_us",
        max(when(col("event_type") === "signup", unix_micros(col("ts")))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        // -1 sentinel instead of null: nullable int64 parquet → pandas
        // float64 drift would muddy the oracle hash compare
        coalesce(col("signup_ts_us"), lit(-1L)).as("signup_ts_us"))
      .orderBy(col("event_id"))
  }

  /** Point-in-time lookup (q163) — the time-travel/SCD2 read every
    * warehouse runs ("state of every entity as of T"): for each user and
    * each of four probe instants, the LATEST event at or before the
    * probe, picked deterministically by (ts, event_id). The as-of join
    * generalized from one probe per row (q27) to a fixed probe batch
    * per entity.
    *
    * Scale shape: the probe set is a broadcast literal relation (audit
    * dates are a handful no matter the corpus); candidates shuffle once
    * on (user, probe) into a max_by partial+final aggregate — no window,
    * no sort, map-side combinable. The ts ≤ probe inequality join
    * against a 4-row broadcast is a fan-out of ≤ |probes| per event. */
  def pointInTime(spark: SparkSession, dir: String): DataFrame =
    pointInTimeFrom(Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("ts"), col("value")))

  /** Same, over an arbitrary (event_id, user_id, ts, value) relation. */
  def pointInTimeFrom(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val probes = Seq("2024-01-08", "2024-01-15", "2024-01-22", "2024-01-29")
      .toDF("probe_date")
      .withColumn("pts", to_timestamp(col("probe_date"), "yyyy-MM-dd"))
    ev
      .join(broadcast(probes), col("ts") <= col("pts"))
      .groupBy(col("user_id"), col("probe_date"))
      .agg(max_by(struct(col("event_id"), col("value")),
        struct(col("ts"), col("event_id"))).as("s"))
      .select(col("user_id"), col("probe_date"),
        col("s.event_id").as("event_id"), col("s.value").as("value"))
      .orderBy(col("user_id"), col("probe_date"))
  }

  /** Interval-overlap join (q203) — the interval×interval sibling of the
    * point-in-range join below (q28): every pair of a shipment TRANSIT
    * interval [l_shipdate, l_receiptdate] (rare heavy lines,
    * l_quantity ≥ 49) and an order FULFILLMENT window [o_orderdate,
    * +14 days] (the o_orderkey % 97 audit slice) that overlap in time,
    * with the exact overlap length in days. The general shape behind
    * sessions×incidents, promos×activity, downtime×shipments.
    *
    * Spark-first plan: both sides explode into the MONTH bins their
    * interval touches, equi-join on the bin (a shuffle join whose skew
    * is bounded by bin width — never an unbounded theta join), apply
    * the exact overlap predicate, and emit each true pair ONLY in its
    * OWNING bin — the month of greatest(start_a, start_b), which both
    * sides of an overlapping pair necessarily replicated into — so
    * every pair appears exactly once with NO distinct/dedup shuffle.
    * Replication factor is ceil(interval/bin) per row; at 100 TB the
    * bin width is the one knob (wider = less replication, more
    * post-filter).
    *
    * The oracle states the definitional theta join — the binned plan
    * must reproduce it row-for-row. */
  def intervalOverlapJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // the fixture carries no receipt date — the transit end is the
    // deterministic l_linenumber-scaled horizon (10-70 days), mirrored
    // literally in the oracle
    intervalOverlapJoinFrom(
      t.lineitem.filter(col("l_quantity") >= 49)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").as("a_start"),
          expr("timestampadd(DAY, l_linenumber * 10, l_shipdate)")
            .as("a_end")),
      t.orders.filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"), col("o_orderdate").as("b_start"),
          expr("timestampadd(DAY, 14, o_orderdate)").as("b_end")))
  }

  /** Same, over arbitrary (keysA, a_start, a_end) × (keysB, b_start,
    * b_end) relations with closed date intervals. The pass-through keys
    * are derived generically: every non-interval column of `a` then of
    * `b` (in their schema order) survives, followed by `overlap_days`;
    * the output sorts on those keys in the same order. Key names must
    * be disjoint across the two sides (the equi-join on `bin` plus this
    * projection would otherwise be ambiguous). */
  private[graft] def intervalOverlapJoinFrom(a: DataFrame,
      b: DataFrame): DataFrame = {
    val keysA = a.columns.filterNot(Set("a_start", "a_end")).toSeq
    val keysB = b.columns.filterNot(Set("b_start", "b_end")).toSeq
    require((keysA.toSet & keysB.toSet).isEmpty,
      s"pass-through key names must be disjoint: ${keysA.toSet & keysB.toSet}")
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("bin", explode(sequence(
        date_trunc("month", col(s)), date_trunc("month", col(e)),
        expr("INTERVAL 1 MONTH"))))
    val keyCols = (keysA ++ keysB).map(col)
    binned(a, "a_start", "a_end")
      .join(binned(b, "b_start", "b_end"), Seq("bin"))
      .filter(col("a_start") <= col("b_end") &&
              col("b_start") <= col("a_end"))
      // ownership: exactly one of the shared bins emits the pair
      .filter(date_trunc("month",
        greatest(col("a_start"), col("b_start"))) === col("bin"))
      .select(keyCols :+
        (datediff(least(col("a_end"), col("b_end")),
          greatest(col("a_start"), col("b_start"))) + 1).cast("long")
          .as("overlap_days"): _*)
      .orderBy(keyCols: _*)
  }

  /** Range join via binning: lineitems shipped within [o_orderdate,
    * o_orderdate + 30 days) for a bounded set of orders. The order side
    * explodes into the month bins its range touches; the lineitem side
    * bins by ship month; the join is an equi-join on the bin with the
    * exact range predicate applied after. */
  def rangeJoinBinned(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val orders = t.orders.filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"), col("o_orderdate").as("range_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("range_end"))
      .withColumn("bin", explode(sequence(
        date_trunc("month", col("range_start")),
        date_trunc("month", col("range_end")),
        expr("INTERVAL 1 MONTH"))))
    val items = t.lineitem
      .select(col("l_orderkey"), col("l_quantity"), col("l_shipdate"))
      .withColumn("bin", date_trunc("month", col("l_shipdate")))
    items.join(broadcast(orders), Seq("bin"))
      .filter(col("l_shipdate") >= col("range_start") &&
              col("l_shipdate") < col("range_end"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("o_orderkey"))
  }
}
