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

  /** TPC-H Q1 shape: pricing summary report. */
  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |       round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
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
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
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
      |ORDER BY revenue DESC, o_ymd, l_orderkey
      |LIMIT 10""".stripMargin

  def tpchQ3(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(q3Sql)
  }

  /** TPC-H Q6 shape: forecasting revenue change (fused scan-filter-agg —
    * the scanfilter_regtest workload as plain SQL). */
  val q6Sql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
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
    """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
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
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Q7: volume shipping between two nations (self-join of nation). */
  val q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |         l_extendedprice * (1.0 - l_discount) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
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
      |       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END), 2) AS nation_volume,
      |       round(sum(volume), 2) AS total_volume
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |         l_extendedprice * (1.0 - l_discount) AS volume,
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
    """SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |         l_extendedprice * (1.0 - l_discount) AS amount
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
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |       c_acctbal, n_name
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
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
    """SELECT round(sum(CASE WHEN p_type = 'PROMO'
      |                      THEN l_extendedprice * (1.0 - l_discount)
      |                      ELSE 0.0 END), 2) AS promo_revenue,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  /** Q15: top supplier (CTE + scalar-subquery max over an aggregate). */
  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier
      |JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
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
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
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
    """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
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
    * nationkey mod 5 (no phone column). */
  val q22Sql: String =
    """SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
      |FROM (
      |  SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal
      |  FROM customer
      |  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      |    AND NOT EXISTS (SELECT 1 FROM orders
      |                    WHERE o_custkey = c_custkey
      |                      AND o_orderpriority = '1-URGENT')
      |) custsale
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin

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
  )
}
