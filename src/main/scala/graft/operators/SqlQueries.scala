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
}
