package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row for the Dataset[T] pipeline demo. */
final case class OrderRow(o_orderkey: Long, o_custkey: Long,
    o_totalprice: Double, o_orderstatus: String)

/** Relational operator surface (SURVEY.md §2.a–§2.h).
  *
  * The reference implements each operator as a hand-fused parallel loop over
  * raw 64 KB pages; here every query is a declarative DataFrame plan so that
  * Catalyst supplies the same physical techniques automatically — whole-stage
  * codegen fuses scan+filter+agg (parity with `scanfilter_regtest.cpp:32-49`),
  * HashAggregateExec does the partial/final two-phase aggregation the
  * reference hand-codes (`groupby_regtest.cpp:32-81`), and broadcast hash
  * join replaces the shared global build table (`hashjoin_regtest.cpp:63-103`).
  *
  * Determinism: every query that returns rows (not a single aggregate) ends
  * in a total-order `orderBy` over its output key columns so result hashes
  * are stable across partitionings, and all money/ratio aggregates are
  * rounded so DuckDB double summation order cannot flip the last ulp.
  */
object Relational {

  /** Full-scan row count — parity with the sequential page scan,
    * `scan_regtest.cpp:28-34`. One codegen'd stage, no shuffle beyond the
    * final partial-count merge. */
  def scanCount(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem.agg(count(lit(1)).as("cnt"))

  /** Fused scan → filter → count — parity with `scanfilter_regtest.cpp:14-57`
    * (values > threshold, per-thread partial counters). Catalyst pushes the
    * predicate into the Parquet scan and fuses the partial count. */
  def scanFilterCount(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .filter(col("l_quantity") > lit(30.0))
      .agg(count(lit(1)).as("cnt"))

  /** Projection + filter — column pruning reaches the scan (ReadSchema only
    * carries 4 of 11 lineitem columns). Parity with the key/value byte
    * extraction of `hashjoin_regtest.cpp:44-47`. */
  def projectFilter(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .filter(col("l_discount") > lit(0.08) && col("l_quantity") > lit(45.0))
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Hash group-by over a low-cardinality key — parity with the per-thread
    * unordered_map + final merge of `groupby_regtest.cpp:32-81`. Spark's
    * HashAggregateExec performs the identical partial (map-side) / final
    * (post-exchange) two-phase shape. */
  def groupByHash(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        // integer percent sum, not round(avg(double),6): the avg's true
        // value lies on a 1/(100n) grid that can coincide with a rounding
        // boundary, where engine summation order decides the flip
        sum(round(col("l_discount") * 100).cast("long")).as("sum_disc_pct"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Dense-key group-by — parity with the 256-slot dense-array variant
    * (`groupby_array_regtest.cpp:30-68`). The key domain (event_type) is
    * tiny; codegen'd hash agg with map-side combine is the Spark analogue of
    * the dense-array specialization. */
  def groupByDense(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"))

  /** Broadcast hash join + sum — parity with `hashjoin_regtest.cpp:30-103`:
    * build side (customer, small) is broadcast — the idiomatic replacement
    * for the merged global hash table shared by all probe threads — and the
    * probe side streams orders, aggregating per key. */
  def hashJoinSum(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .join(broadcast(t.customer), t.orders("o_custkey") === t.customer("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("c_nationkey"))
  }

  /** Shuffle (sort-merge) join on the fact table: lineitem ⋈ orders.
    * Revenue per order priority. The merge hint PINS the fact-fact
    * strategy this query exists to demonstrate (§2.c "shuffle/SMJ"):
    * without it AQE converts to broadcast at bench SFs, which (a) isn't
    * the plan a 100 TB orders side would ever get, and (b) moves the
    * cost onto a driver-side 150k-row broadcast build whose
    * GC-sensitive variance polluted the q07 trend line (rounds 12-13
    * measured 0.85-1.01 s as BHJ vs 0.70-0.81 s as SMJ at sf0.1 —
    * the executor-side shuffle is both the honest shape and faster). */
  def shuffleJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders.hint("merge"),
        t.lineitem("l_orderkey") === t.orders("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("cnt"),
        // integer fixed-point (1e-4 currency): BIGINT sums are associative,
        // so partial-aggregation order can never flip a rounded cent
        sum(round(col("l_extendedprice") * 100).cast("long")
          * (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("revenue_fp4"))
      .orderBy(col("o_orderpriority"))
  }

  /** Multi-way star join (lineitem→orders→customer→nation→region): revenue
    * by region. Dimension tables are broadcast; only the fact-side join
    * shuffles. TPC-H Q5-shaped. */
  def starJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(round(col("l_extendedprice") * 100).cast("long")
          * (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("revenue_fp4"))
      .orderBy(col("r_name"))
  }

  /** Left-semi join (EXISTS) — customers that have at least one high-value
    * order. SURVEY §2.c lists semi/anti as capability-gap fills. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders.filter(col("o_totalprice") > lit(100000.0)),
        t.customer("c_custkey") === t.orders("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS) — customers with no orders at all. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, t.customer("c_custkey") === t.orders("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Top-k: Catalyst rewrites orderBy+limit into TakeOrderedAndProjectExec —
    * a per-partition bounded heap + driver-side merge, no global sort.
    * Tie-broken on o_orderkey for determinism. */
  def topK(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(25)

  /** Global sort (range-partitioned sample sort, SortExec) — parity with the
    * fiber-pool parallel merge sort demo (`src/tests/tasking_test.cpp:72-141`). */
  def sortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .orderBy(col("o_orderstatus"), col("o_custkey"), col("o_orderkey"))
      .limit(100)

  /** Set operations (SURVEY §2.g): customers in the BUILDING segment vs
    * customers having an open order — intersect / except / union counts. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val building = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val open = t.orders.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    val u = building.union(open).distinct().agg(count(lit(1)).as("n")).select(lit("union").as("op"), col("n"))
    val i = building.intersect(open).agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n"))
    val e = building.except(open).agg(count(lit(1)).as("n")).select(lit("except").as("op"), col("n"))
    u.union(i).union(e).orderBy(col("op"))
  }

  /** Exact distinct (dropDuplicates) over a composite key. */
  def distinctKeys(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .select(col("l_returnflag"), col("l_linestatus"))
      .dropDuplicates()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Aggregate-function battery: min/max/avg/stddev/count distinct. */
  def aggStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .agg(
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))

  /** Rollup (grouping sets / Catalyst Expand) — SURVEY §2.d ABSENT-row fill. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("cnt"))
      .orderBy(col("rf"), col("ls"))

  /** Cube over two keys. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        col("cnt"), col("sum_price"))
      .orderBy(col("st"), col("pri"))

  /** Conditional aggregation (sum of CASE WHEN) — the build-side predicate
    * of `hashjoin_regtest.cpp:49` generalized. */
  def caseWhenAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"))
      .orderBy(col("o_orderpriority"))

  /** Scalar-function battery (SURVEY §2.h — all ABSENT in the reference,
    * supplied by org.apache.spark.sql.functions): string / math / date,
    * expressed identically in ANSI SQL for the oracle. */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name8"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        abs(col("p_size") - lit(25)).as("size_dev"),
        round(col("p_retailprice") * lit(1.1), 2).as("price_up"),
        (col("p_partkey") % lit(7)).as("k_mod7"))
      .orderBy(col("p_partkey"))

  /** Date/time functions over orders (year/month extraction + arithmetic). */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("yr"), col("mo"))

  /** Dense-key group-by via the typed DenseCounter Aggregator — parity
    * with the reference's 256-slot array specialization
    * (`groupby_array_regtest.cpp:30-68`); the key domain (l_linenumber ∈
    * 1..7) is provably dense. */
  def denseGroupBy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables(spark, dir).lineitem
      .select(col("l_linenumber")).as[Int]
      .select(new graft.functions.DenseCounter(8).toColumn.name("counts"))
    counts.select(posexplode(col("counts")).as(Seq("linenumber", "cnt")))
      .filter(col("cnt") > 0)
      .select(col("linenumber").cast("long").as("linenumber"), col("cnt"))
      .orderBy(col("linenumber"))
  }

  /** HLL++ approx-distinct next to the exact count — the sketch-bearing
    * surface, bound-asserted spec-side (PropertySpec:
    * |approx − exact| / exact < 5%). */
  def approxDistinctFunnel(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))

  /** Oracle-hashed q54 surface: the exact count only. The sketch value is
    * engine-specific, so its error bound lives in the spec on the funnel
    * above — NOT as an oracle-hashed flag — meaning a Spark-internal HLL
    * change can never fail hash verification for a correct sketch (the
    * previous constant-`true`-flag oracle could). Catalyst prunes the
    * sketch from THIS projection; the funnel is the sketch evidence. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    approxDistinctFunnel(spark, dir).select(col("exact_parts"))

  /** Array-function battery over split words (SURVEY §2.h ABSENT-fill):
    * size/element_at/sort/slice/contains/distinct as codegen'd built-ins. */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("words")).cast("long").as("n_words"),
        element_at(col("words"), 1).as("first_word"),
        element_at(col("words"), -1).as("last_word"),
        concat_ws(",", slice(sort_array(col("words")), 1, 3)).as("sorted3"),
        array_contains(col("words"), "the").as("has_the"),
        size(array_distinct(col("words"))).cast("long").as("distinct_words"))
      .orderBy(col("doc_id"))

  /** Dynamic pivot (Catalyst Pivot operator): order counts status ×
    * priority. Same semantics as caseWhenAgg, different operator. */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("o_orderpriority"))

  /** Multiset set operations (EXCEPT ALL / INTERSECT ALL — duplicate-
    * preserving, unlike §2.g's distinct variants). */
  def setOpsMultiset(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val open = t.orders.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val fin = t.orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val e = open.exceptAll(fin).agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("n"))
    val i = open.intersectAll(fin).agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("n"))
    e.union(i).orderBy(col("op"))
  }

  /** Left outer join with null-aware aggregation: every customer with
    * their order count, zero included (count(col) skips nulls). */
  def leftOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.join(t.orders,
        t.customer("c_custkey") === t.orders("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** Full outer join of two aggregates: open vs finished order counts per
    * customer, null branches coalesced to 0. */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val open = t.orders.filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_open"))
    val fin = t.orders.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_fin"))
    open.withColumnRenamed("k", "ko")
      .join(fin.withColumnRenamed("k", "kf"),
        col("ko") === col("kf"), "full_outer")
      .select(coalesce(col("ko"), col("kf")).as("custkey"),
        coalesce(col("n_open"), lit(0L)).as("n_open"),
        coalesce(col("n_fin"), lit(0L)).as("n_fin"))
      .orderBy(col("custkey"))
  }

  /** min_by / max_by (argmin/argmax): cheapest and priciest lineitem per
    * return flag. The ordering value folds in a unique row id
    * (price·10¹⁰ + orderkey·10 + linenumber, exact in a double) so
    * argmin/argmax are deterministic in both engines despite price ties. */
  def minMaxBy(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .withColumn("v",
        col("l_extendedprice") * lit(1e10) + col("l_orderkey") * lit(10L)
          + col("l_linenumber"))
      .groupBy(col("l_returnflag"))
      .agg(min_by(col("l_orderkey"), col("v")).as("cheapest_order"),
        max_by(col("l_orderkey"), col("v")).as("priciest_order"))
      .orderBy(col("l_returnflag"))

  /** Extended string-function battery (lpad/rpad/trim/reverse/repeat/
    * left/right/startswith/contains). */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).customer
      .select(col("c_custkey"),
        lpad(col("c_mktsegment"), 12, "*").as("seg_lpad"),
        rpad(col("c_mktsegment"), 12, "-").as("seg_rpad"),
        trim(lit("  pad  ")).as("trimmed"),
        reverse(col("c_name")).as("name_rev"),
        repeat(substring(col("c_name"), 1, 2), 3).as("rep2x3"),
        substring(col("c_name"), -3, 3).as("name_last3"),
        col("c_name").startsWith("Customer").as("is_cust"),
        col("c_name").contains("00").as("has_00"))
      .orderBy(col("c_custkey"))
  /** Explicit GROUPING SETS (beyond rollup/cube): per-status totals,
    * per-priority totals, and the grand total in one pass (one Expand). */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("s"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("p"),
        col("cnt"))
      .orderBy(col("s"), col("p"))

  /** Exact interpolated percentiles (median / p90) per order status,
    * reported in mills (0.001 currency, BIGINT). The interpolated value of
    * cent-quantized data at g ∈ {0, .1, …, .9} lies exactly ON the mills
    * grid, so rounding to mills absorbs the engines' different
    * interpolation formulas — while round(·, 2) would sit exactly on a
    * half-cent boundary whenever a median midpoint has an odd cent sum. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)") * 1000).cast("long").as("p50_mills"),
        round(expr("percentile(o_totalprice, 0.9)") * 1000).cast("long").as("p90_mills"))
      .orderBy(col("o_orderstatus"))

  /** Statistical aggregates: correlation, stddev, variance, covariance. */
  def statsAgg(spark: SparkSession, dir: String): DataFrame = {
    // corr/stddev/var/covar from exact BIGINT second moments: per-row
    // integers (qty is integral; price quantized to whole currency via
    // exact cents DIV 100 — floor division, no half-way rounding; discount
    // in pct), summed in BIGINT (order-independent), then ONE double
    // expression per statistic whose text is identical in the DuckDB
    // oracle — IEEE +,-,*,/ and sqrt are correctly rounded in both
    // engines, so the output is bit-exact with no round() at all.
    // (The built-in corr()/stddev() stream doubles in partition order,
    // which is nondeterministic in the last ulp across engines/splits.)
    // Headroom: sum(p*p) <= 1e10/row — BIGINT-safe to ~9e8 rows (sf~150),
    // the same envelope as the battery's fp4 revenue sums.
    val m = Tables(spark, dir).lineitem
      .select(
        round(col("l_quantity")).cast("long").as("q"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) DIV 100").as("p"),
        round(col("l_discount") * 100).cast("long").as("d"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("sq"), sum(col("q") * col("q")).as("sqq"),
        sum(col("p")).as("sp"), sum(col("p") * col("p")).as("spp"),
        sum(col("q") * col("p")).as("sqp"),
        sum(col("d")).as("sd"), sum(col("d") * col("d")).as("sdd"))
    m.selectExpr(
      """(CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
         / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
            * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)))
         AS corr_qp""",
      """sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
            / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
         AS sd_qty""",
      """(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
            / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 10000.0
         AS var_disc""",
      """(CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
            / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
         AS cov_qp""")
  }

  /** Fixed-width histogram via integer bucket arithmetic (30k-wide
    * buckets over order totals). */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(floor(col("o_totalprice") / lit(30000.0)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("bucket"))

  /** Null-handling semantics: nullif, null-skipping count, null-safe
    * equality (<=> / IS NOT DISTINCT FROM). */
  def nullHandling(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(
        count(nullif(col("o_orderstatus"), lit("P"))).as("n_not_p"),
        sum(when(col("o_orderstatus") <=> lit("P"), 1L).otherwise(0L)).as("n_p"),
        count(lit(1)).as("cnt"))
      .orderBy(col("o_orderpriority"))

  /** Regex battery: extract, extract+cast, rlike, replace-all. */
  def regexFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).customer
      .select(col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("id_str"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("id_num"),
        col("c_name").rlike("[0-9]+$").as("ends_num"),
        regexp_replace(col("c_name"), "[0-9]", "x").as("masked"))
      .orderBy(col("c_custkey"))

  /** Date arithmetic battery: day diffs, month addition (with month-end
    * clamping), last_day, quarter, ISO week — calendar outputs emitted as
    * ymd integers so no timestamp type crosses the compare boundary. */
  def dateArith(spark: SparkSession, dir: String): DataFrame = {
    def ymd(c: org.apache.spark.sql.Column) =
      (year(c) * 10000 + month(c) * 100 + dayofmonth(c)).cast("long")
    Tables(spark, dir).orders
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp"))
          .cast("long").as("days_since_95"),
        ymd(add_months(col("o_orderdate"), 3)).as("plus3m_ymd"),
        ymd(last_day(col("o_orderdate"))).as("eom_ymd"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"))
      .orderBy(col("o_orderkey"))
  }

  /** Typed Dataset pipeline (SURVEY §1.1: ITypedTable ≈ Dataset[T]):
    * case-class rows, lambda filter, groupByKey + mapGroups with exact
    * integer-cents accumulation. Demonstrates the typed API; the
    * DataFrame formulation is preferred on hot paths (codegen). */
  def typedPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
      .as[OrderRow]
      .filter(_.o_orderstatus == "O")
      .groupByKey(_.o_custkey)
      .mapGroups { (k, rows) =>
        var n = 0L
        var cents = 0L
        rows.foreach { r => n += 1; cents += math.round(r.o_totalprice * 100) }
        (k, n, cents)
      }
      .toDF("custkey", "n_orders", "sum_cents")
      .orderBy(col("custkey"))
  }

  /** First-wins duplicate-key build side — the reference's hash-join build
    * keeps the first value seen per key (`hashjoin_regtest.cpp:51-53`),
    * which is scan-order-dependent; the engine replaces it with the
    * deterministic rule SURVEY §7 prescribes (min_by lowest orderkey), so
    * an oracle can express it. Build: one row per customer (their lowest-
    * keyed order's price); probe: orders joined against it. */
  def firstWinsJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val build = t.orders
      .groupBy(col("o_custkey").as("k"))
      .agg(min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"))
    t.orders.join(broadcast(build), col("o_custkey") === col("k"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("first_price")), 2).as("sum_first_price"))
      .orderBy(col("o_custkey"))
  }

  /** Approximate percentiles (t-digest-style sketch) next to exact — the
    * sketch-bearing surface, bound-asserted spec-side (PropertySpec:
    * within 1% of the exact interpolated percentile). */
  def approxPercentileFunnel(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .agg(
        expr("approx_percentile(o_totalprice, array(0.5, 0.9), 10000)").as("approx"),
        expr("percentile(o_totalprice, array(0.5, 0.9))").as("exact"))

  /** Oracle-hashed q85 surface: the exact interpolated percentiles only
    * (the formulation q77 already oracles, in fixed-point mills). The
    * sketch's error bound lives in the spec on the funnel above — NOT as
    * an oracle-hashed flag — so a Spark-internal percentile-sketch change
    * can never fail hash verification for a correct sketch. */
  def approxPercentile(spark: SparkSession, dir: String): DataFrame =
    approxPercentileFunnel(spark, dir)
      .select(
        round(element_at(col("exact"), 1) * 1000).cast("long").as("p50_mills"),
        round(element_at(col("exact"), 2) * 1000).cast("long").as("p90_mills"))

  /** Bloom-filter membership (the runtime-filter pattern Spark uses for
    * join pruning, exposed as an operator): build a bloom filter over
    * high-value order keys, probe the fact table with might_contain. The
    * bloom-pass count is sketch/hash-specific, so the hashable output is
    * the exact semi-join count plus the no-false-negatives flag — true by
    * bloom construction, hence deterministic (the funnel's false-positive
    * rate is additionally bounded in tests). */
  def bloomMembership(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val bridge = org.apache.spark.sql.graft.bridge
    val (hot, bf) = bloomBuild(t)
    t.lineitem.join(hot.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .agg(
        count(lit(1)).as("n_exact"),
        (coalesce(sum(when(
          bridge.mightContain(lit(bf), xxhash64(col("l_orderkey"))),
          0L).otherwise(1L)), lit(0L)) === 0L).as("no_false_negatives"))
  }

  /** The bloom build behind q86: hot keys + the serialized filter. The
    * sketch itself is tiny (~numBits/8 bytes): materialize and inline as a
    * constant — the same broadcast-a-filter shape Spark's injected runtime
    * filters use (might_contain requires a constant bloom input). */
  private def bloomBuild(t: Tables): (DataFrame, Array[Byte]) = {
    val bridge = org.apache.spark.sql.graft.bridge
    val hot = t.orders.filter(col("o_totalprice") > 300000.0)
    val bf: Array[Byte] = hot
      .agg(bridge.bloomFilterAgg(xxhash64(col("o_orderkey")), 50000L, 400000L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    (hot, bf)
  }

  /** Test hook: the raw (bloom-pass, exact) funnel counts behind q86 — the
    * pass count is hash-specific so it stays out of the oracled surface. */
  private[graft] def bloomFunnel(spark: SparkSession, dir: String): (Long, Long) = {
    val t = Tables(spark, dir)
    val bridge = org.apache.spark.sql.graft.bridge
    val (hot, bf) = bloomBuild(t)
    val nBloom = t.lineitem
      .filter(bridge.mightContain(lit(bf), xxhash64(col("l_orderkey"))))
      .count()
    val nExact = t.lineitem.join(hot.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    (nBloom, nExact)
  }

  /** Boolean and bitwise aggregates (order-independent, so exactly
    * comparable): bool_and/bool_or + bit_and/bit_or/bit_xor per key. */
  def boolBitAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        bool_and(col("l_quantity") > lit(1.0)).as("all_qty_gt1"),
        bool_or(col("l_discount") > lit(0.09)).as("any_disc_gt9"),
        bit_and(col("l_partkey")).as("band"),
        bit_or(col("l_partkey")).as("bor"),
        bit_xor(col("l_partkey")).as("bxor"))
      .orderBy(col("l_returnflag"))

  /** Spark 4 VariantType: parse_json into a variant column, typed
    * extraction with variant_get — the semi-structured path for schema-
    * fluid columns (same oracle as plain JSON extraction). */
  def variantJson(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
      .orderBy(col("event_id"))
      .limit(500)

  /** Schema-projected JSON: from_json with an explicit struct schema,
    * then field access (the strict-schema counterpart of get_json_object). */
  def fromJsonStruct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
          .getField("k").as("k"))
      .orderBy(col("event_id"))
      .limit(500)

  /** JSON extraction from the events.props string column (SURVEY §2.h). */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy(col("event_id"))
      .limit(500)

  /** Referential-integrity audit (q171) — the data-quality gate a
    * warehouse runs after every load: for each foreign-key relationship
    * in the star schema, total child rows and how many dangle (no
    * matching parent). Each check is one left-anti join against the
    * parent's key projection (broadcast for dimensions, key-shuffle for
    * the fact chain) + a count — linear per relationship, the exact
    * shape of the reference's CSR verify pass re-aimed at relational
    * constraints. */
  def integrityAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def check(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame = {
      val dangling = child
        .join(parent.select(col(parentKey).as(childKey)),
          Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("n_dangling"))
      child.agg(count(lit(1)).as("n_rows"))
        .crossJoin(dangling)
        .select(lit(name).as("relationship"), col("n_rows"), col("n_dangling"))
    }
    check("lineitem->orders", t.lineitem.select(col("l_orderkey")),
        "l_orderkey", t.orders, "o_orderkey")
      .unionByName(check("orders->customer", t.orders.select(col("o_custkey")),
        "o_custkey", t.customer, "c_custkey"))
      .unionByName(check("customer->nation",
        t.customer.select(col("c_nationkey")),
        "c_nationkey", t.nation, "n_nationkey"))
      .unionByName(check("nation->region", t.nation.select(col("n_regionkey")),
        "n_regionkey", t.region, "r_regionkey"))
      .unionByName(check("supplier->nation",
        t.supplier.select(col("s_nationkey")),
        "s_nationkey", t.nation, "n_nationkey"))
      .orderBy(col("relationship"))
  }

  /** Hierarchy rollup (q204) — the BOM-explosion / category-tree
    * aggregate every warehouse runs ("subtree totals for every node"):
    * parts form the implicit binary-heap hierarchy parent(p) =
    * (p−1) div 2 (root 0), and each of the first 50 categories reports
    * its descendant count and subtree retail-price total in exact
    * cents.
    *
    * Spark-first plan: instead of an O(depth) iterative child→parent
    * join loop (the naive formulation — depth shuffles, lineage
    * growth), the heap layout admits a CLOSED FORM for the whole
    * ancestor chain — the k-th ancestor of p is (p+1) div 2ᵏ − 1 — so
    * one log₂(n)-bounded explode + ONE shuffle computes every subtree
    * aggregate at once. The oracle deliberately states the
    * definitional recursive parent-walk instead; the two must agree
    * row-for-row. Generalizes to any hierarchy with materialized-path
    * ids (the standard trick: encode the path, explode prefixes).
    *
    * Scale shape: replication = ⌈log₂ n⌉ per row (≈ 34 at 10¹⁰ parts),
    * one hash aggregate, output bounded by the category filter. */
  def hierarchyRollup(spark: SparkSession, dir: String): DataFrame =
    hierarchyRollupFrom(Tables(spark, dir).part
      .select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents")))

  /** Same, over an arbitrary (p_partkey, cents) relation. */
  private[graft] def hierarchyRollupFrom(parts: DataFrame,
      maxNode: Long = 50L): DataFrame =
    parts
      .select(col("cents"), explode(expr(
        """filter(transform(sequence(0, 40),
          |  k -> ((p_partkey + 1) div shiftleft(CAST(1 AS BIGINT), k)) - 1),
          |  x -> x >= 0)""".stripMargin)).as("anc"))
      .filter(col("anc") < maxNode)
      .groupBy(col("anc").as("p_partkey"))
      .agg((count(lit(1)) - 1).as("n_desc"),
        sum(col("cents")).as("subtree_cents"))
      .orderBy(col("p_partkey"))
}
