package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL front door: classic TPC-H-shaped queries executed via
  * `spark.sql` over registered views — the same text (ANSI subset, valid
  * in both Spark and DuckDB) serves as its own oracle. Demonstrates that
  * a reference user gets a full SQL surface, not just the Column DSL.
  */
object SqlQueries {

  private def registerViews(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    t.lineitem.createOrReplaceTempView("lineitem")
    t.orders.createOrReplaceTempView("orders")
    t.customer.createOrReplaceTempView("customer")
    t.supplier.createOrReplaceTempView("supplier")
    t.part.createOrReplaceTempView("part")
    t.nation.createOrReplaceTempView("nation")
    t.region.createOrReplaceTempView("region")
  }

  /** Generic runner: the query text IS the operator (and its oracle). */
  def run(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sql)
  }

  // Money arithmetic convention for every battery query: integer
  // fixed-point. Prices/balances are cent-quantized doubles, discounts and
  // taxes 2-decimal fractions; `round(x*100)` recovers the exact integer,
  // and all sums run in BIGINT — associative, so Spark's and DuckDB's
  // different summation orders cannot disagree (a `round(sum(double),2)`
  // flips at half-cent boundaries; see graft-oracle-parity-rules).
  // `_fp4` = units of 1e-4 currency (cents × percent). BIGINT headroom:
  // |fp4| < 1e9/row → a single group overflows past ~9e9 rows (far beyond
  // sf1000's largest group). Three-factor fp6 terms (~1e11/row) WOULD
  // overflow near sf150 in q1's 4-group shape, so charge is quantized to
  // cents per row (floor(fp6/1e4) — deterministic in both engines: the
  // quotient of a <2^53 integer-valued double is correctly rounded and
  // never within an ulp of a wrong integer) before the BIGINT sum.

  /** TPC-H Q1 shape: pricing summary report. */
  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_fp4,
      |       CAST(sum(CAST(floor(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                * (100 - CAST(round(l_discount * 100) AS BIGINT))
      |                * (100 + CAST(round(l_tax * 100) AS BIGINT)) / 10000.0) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def tpchQ1(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(q1Sql)
  }

  /** TPC-H Q3 shape: shipping-priority revenue top-10. */
  val q3Sql: String =
    """SELECT l_orderkey,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_fp4,
      |       CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100
      |            + day(o_orderdate) AS BIGINT) AS o_ymd,
      |       o_orderpriority
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY 1, 3, 4
      |ORDER BY revenue_fp4 DESC, o_ymd, l_orderkey
      |LIMIT 10""".stripMargin

  def tpchQ3(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(q3Sql)
  }

  /** TPC-H Q6 shape: forecasting revenue change (fused scan-filter-agg —
    * the scanfilter_regtest workload as plain SQL). */
  val q6Sql: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_fp4
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  def tpchQ6(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(q6Sql)
  }

  // --- Round-2 battery: the remaining TPC-H query shapes expressible over
  // the reduced fixture schema (no partsupp / commitdate / shipmode / phone;
  // those queries are adapted to equivalent plan shapes, noted per query).
  // Each text is ANSI common to Spark and DuckDB and serves as its own
  // oracle. All sums of money are round(_, 2); year() is cast to BIGINT
  // (DuckDB year() is BIGINT, Spark's is INT); quantity sums are exact
  // integers in double so CAST AS BIGINT is engine-agnostic.

  /** Q4: order-priority checking. Adapted: "late" = some lineitem shipped
    * >30 days after order date (fixture lacks commit/receipt dates).
    * Exercises correlated EXISTS decorrelation → left-semi join. */
  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Q5: local-supplier volume — the 6-way snowflake join. */
  val q5Sql: String =
    """SELECT n_name,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_fp4
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue_fp4 DESC, n_name""".stripMargin

  /** Q7: volume shipping between two nation groups (self-join of nation).
    * Adapted: a fixed nation PAIR yields zero rows on the sf0.001 fixture
    * (only 10 suppliers exist there), so the bidirectional pair predicate
    * is expressed over even/odd nationkey groups — same self-join +
    * disjunctive-pair plan shape, rows at every SF. */
  val q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |       CAST(sum(volume) AS BIGINT) AS revenue_fp4
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |         CAST(round(l_extendedprice * 100) AS BIGINT)
      |           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_nationkey % 2 = 0 AND n2.n_nationkey % 2 = 1)
      |      OR (n1.n_nationkey % 2 = 1 AND n2.n_nationkey % 2 = 0))
      |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                       AND TIMESTAMP '1997-12-31 00:00:00'
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q8: national market share. Adapted: emits numerator and denominator
    * as separate rounded sums (a cross-engine float division would not be
    * bit-stable; the consumer divides). */
  val q8Sql: String =
    """SELECT o_year,
      |       CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) AS BIGINT) AS nation_volume_fp4,
      |       CAST(sum(volume) AS BIGINT) AS total_volume_fp4
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |         CAST(round(l_extendedprice * 100) AS BIGINT)
      |           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS volume,
      |         n1.n_name AS nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region   ON n2.n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
      |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                        AND TIMESTAMP '1997-12-31 00:00:00'
      |) all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** Q9: product-type profit. Adapted: profit = discounted revenue (fixture
    * has no partsupp/supplycost); LIKE-driven part filter retained. */
  val q9Sql: String =
    """SELECT nation, o_year, CAST(sum(amount) AS BIGINT) AS sum_profit_fp4
      |FROM (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |         CAST(round(l_extendedprice * 100) AS BIGINT)
      |           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS amount
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%widget%'
      |) profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  /** Q10: returned-item reporting, top 20 customers by lost revenue. */
  val q10Sql: String =
    """SELECT c_custkey, c_name,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_fp4,
      |       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents, n_name
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue_fp4 DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Q13: customer order-count distribution (outer join + double group-by).
    * Priority filter stands in for the comment NOT LIKE. */
  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |                        AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey
      |) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q14: promotion effect. Adapted: numerator/denominator emitted
    * separately (see q8) — p_type = 'PROMO' is the fixture's promo class. */
  val q14Sql: String =
    """SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
      |                      THEN CAST(round(l_extendedprice * 100) AS BIGINT)
      |                           * (100 - CAST(round(l_discount * 100) AS BIGINT))
      |                      ELSE 0 END) AS BIGINT) AS promo_revenue_fp4,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_revenue_fp4
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  /** Q15: top supplier (CTE + scalar-subquery max over an aggregate).
    * Fixed-point revenue makes the max-equality predicate exact. */
  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_revenue_fp4
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue_fp4
      |FROM supplier
      |JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue_fp4 = (SELECT max(total_revenue_fp4) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** Q16: parts/supplier relationship. Adapted: the part↔supplier relation
    * is lineitem (no partsupp); count(DISTINCT) after a join. */
  val q16Sql: String =
    """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part
      |JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#5' AND p_size IN (1, 9, 19, 29, 49)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  /** Q17: small-quantity-order revenue — correlated scalar aggregate
    * subquery per part. avg() of exactly-representable integer quantities
    * is bit-identical cross-engine, so the predicate is stable. */
  val q17Sql: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#3'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
      |                    FROM lineitem l2
      |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin

  /** Q18: large-volume customers (HAVING over an exact-integer sum). */
  val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey,
      |       CAST(sum(l_quantity) AS BIGINT) AS total_qty
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey
      |HAVING sum(l_quantity) > 250
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** Q19: discounted revenue over OR'd multi-column predicate brackets
    * (disjunctive predicate pushdown through a join). */
  val q19Sql: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_fp4
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1 AND l_quantity <= 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity >= 10 AND l_quantity <= 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin

  /** Q22: global sales opportunity. Adapted: "no orders" never happens in
    * the fixture, so the anti-join is "no URGENT orders"; country code is
    * nationkey mod 5 (no phone column). The avg() comparison is made exact
    * by cross-multiplying in integer cents: bal > sum/cnt ⇔ bal·cnt > sum. */
  val q22Sql: String =
    """SELECT cntrycode, count(*) AS numcust,
      |       CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
      |FROM (
      |  SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      |  FROM customer
      |  WHERE CAST(round(c_acctbal * 100) AS BIGINT)
      |          * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
      |        > (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |           FROM customer WHERE c_acctbal > 0.0)
      |    AND NOT EXISTS (SELECT 1 FROM orders
      |                    WHERE o_custkey = c_custkey
      |                      AND o_orderpriority = '1-URGENT')
      |) custsale
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin

  /** Q21: suppliers who kept orders waiting — EXISTS + NOT EXISTS over the
    * same table under different aliases, the classic double semi/anti-join
    * against one scan. Adapted (no commit/receipt dates): "kept waiting" =
    * this supplier shipped strictly last among multi-supplier 'F' orders.
    * Both subqueries carry the non-equi correlated predicate
    * (l_suppkey <>, l_shipdate >) that forces real decorrelation. */
  val q21Sql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders   ON o_orderkey = l1.l_orderkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** Q12: shipping modes and order priority — conditional counts over a
    * fact-fact join. Adapted (no l_shipmode/commitdate columns): the mode
    * class is l_returnflag and the lateness predicate is the ship-date
    * window alone. */
  val q12Sql: String =
    """SELECT l_returnflag,
      |       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Q11: important stock identification — group sums kept only when they
    * exceed a fraction of the global total. Adapted to customer order
    * value (no partsupp); the fraction predicate is cross-multiplied in
    * integer cents (value > total·0.0015 ⇔ value·10000 > total·15) so the
    * comparison is exact on both engines. */
  val q11Sql: String =
    """SELECT c_custkey, value_cents
      |FROM (
      |  SELECT o_custkey AS c_custkey,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |  FROM orders GROUP BY o_custkey) v
      |WHERE value_cents * 10000 >
      |      (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) * 15
      |       FROM orders)
      |ORDER BY value_cents DESC, c_custkey""".stripMargin

  /** Q2: minimum-cost supplier — the correlated scalar-min subquery.
    * Adapted (no partsupp/supplycost): part cost = extended price on
    * lineitem in integer cents; each surviving row's price equals the
    * correlated per-part minimum. DISTINCT collapses tied line items of
    * the same (part, supplier). */
  val q2Sql: String =
    """SELECT DISTINCT
      |       CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents,
      |       s_name, p_partkey, p_name
      |FROM part
      |JOIN lineitem ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |WHERE p_size = 15
      |  AND CAST(round(l_extendedprice * 100) AS BIGINT) =
      |      (SELECT min(CAST(round(l2.l_extendedprice * 100) AS BIGINT))
      |       FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      |ORDER BY acctbal_cents DESC, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** Q20: excess-stock suppliers — nested IN subqueries with a grouped
    * HAVING threshold (IN → semi join, HAVING → aggregate-then-filter
    * decorrelation). Adapted: "stock" = shipped quantity of bolt parts. */
  val q20Sql: String =
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part
      |                      WHERE p_name LIKE '%bolt%')
      |  GROUP BY l_suppkey
      |  HAVING sum(l_quantity) > 100)
      |ORDER BY s_suppkey""".stripMargin

  /** name → SQL for the round-2 battery (wired into SparkEntry). */
  val battery2: Seq[(String, String)] = Seq(
    "q92_tpch_q4_sql"  -> q4Sql,
    "q93_tpch_q5_sql"  -> q5Sql,
    "q94_tpch_q7_sql"  -> q7Sql,
    "q95_tpch_q8_sql"  -> q8Sql,
    "q96_tpch_q9_sql"  -> q9Sql,
    "q97_tpch_q10_sql" -> q10Sql,
    "q98_tpch_q13_sql" -> q13Sql,
    "q99_tpch_q14_sql" -> q14Sql,
    "q100_tpch_q15_sql" -> q15Sql,
    "q101_tpch_q16_sql" -> q16Sql,
    "q102_tpch_q17_sql" -> q17Sql,
    "q103_tpch_q18_sql" -> q18Sql,
    "q104_tpch_q19_sql" -> q19Sql,
    "q105_tpch_q22_sql" -> q22Sql,
    "q106_tpch_q21_sql" -> q21Sql,
    "q107_tpch_q12_sql" -> q12Sql,
    "q108_tpch_q11_sql" -> q11Sql,
    "q109_tpch_q2_sql"  -> q2Sql,
    "q110_tpch_q20_sql" -> q20Sql,
  )
}
