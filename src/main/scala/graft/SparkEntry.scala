package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{GraphOps, Relational, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` carries the DuckDB-dialect
  * equivalent for every SQL-expressible query. Column names and types are
  * aligned pairwise (the driver sorts columns by name and hashes values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.starJoin(spark, "/root/testdata/sf0.001")

  type Q = (SparkSession, String) => DataFrame

  /** Relational core (SURVEY §2.a–§2.h). */
  private val relational: Map[String, Q] = Map(
    "q01_scan_count"        -> (Relational.scanCount _),
    "q02_scan_filter_count" -> (Relational.scanFilterCount _),
    "q03_project_filter"    -> (Relational.projectFilter _),
    "q04_groupby_hash"      -> (Relational.groupByHash _),
    "q05_groupby_dense"     -> (Relational.groupByDense _),
    "q06_hashjoin_sum"      -> (Relational.hashJoinSum _),
    "q07_shuffle_join_agg"  -> (Relational.shuffleJoinAgg _),
    "q08_star_join"         -> (Relational.starJoin _),
    "q09_semi_join"         -> (Relational.semiJoin _),
    "q10_anti_join"         -> (Relational.antiJoin _),
    "q11_topk"              -> (Relational.topK _),
    "q12_sort_limit"        -> (Relational.sortLimit _),
    "q13_setops"            -> (Relational.setOps _),
    "q14_distinct"          -> (Relational.distinctKeys _),
    "q15_agg_stats"         -> (Relational.aggStats _),
    "q16_rollup"            -> (Relational.rollupAgg _),
    "q17_cube"              -> (Relational.cubeAgg _),
    "q18_casewhen_agg"      -> (Relational.caseWhenAgg _),
    "q19_scalar_funcs"      -> (Relational.scalarFuncs _),
    "q20_date_funcs"        -> (Relational.dateFuncs _),
    "q21_json_funcs"        -> (Relational.jsonFuncs _),
  )

  /** Window / analytic functions (SURVEY §2.e). */
  private val windows: Map[String, Q] = Map(
    "q22_window_rank"        -> (Windows.windowRank _),
    "q23_window_running_sum" -> (Windows.windowRunningSum _),
    "q24_window_lag"         -> (Windows.windowLag _),
    "q25_window_moving_avg"  -> (Windows.windowMovingAvg _),
    "q26_window_ranking"     -> (Windows.windowRanking _),
  )

  /** Graph analytics (SURVEY §2.i). */
  private val graph: Map[String, Q] = Map(
    "q30_adjacency_build" -> (GraphOps.adjacencyBuild _),
    "q31_degrees"         -> (GraphOps.degrees _),
    "q32_bfs"             -> ((s: SparkSession, d: String) => GraphOps.bfs(s, d)),
    "q33_sssp"            -> ((s: SparkSession, d: String) => GraphOps.sssp(s, d)),
    "q34_triangle_count"  -> (GraphOps.triangleCount _),
    "q35_connected_components" -> (GraphOps.connectedComponents _),
    "q36_pagerank"        -> (GraphOps.pageRank _),
  )

  def queries: Map[String, Q] = relational ++ windows ++ graph

  private val relationalOracles: Map[String, String] = Map(
    "q01_scan_count" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "q02_scan_filter_count" ->
      "SELECT count(*) AS cnt FROM lineitem WHERE l_quantity > 30.0",
    "q03_project_filter" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
        |FROM lineitem WHERE l_discount > 0.08 AND l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q04_groupby_hash" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       round(avg(l_discount), 6) AS avg_disc
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q05_groupby_dense" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q06_hashjoin_sum" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q07_shuffle_join_agg" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q08_star_join" ->
      """SELECT r_name, count(*) AS cnt,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey  = o_orderkey
        |JOIN customer ON o_custkey   = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q10_anti_join" ->
      """SELECT count(*) AS cnt FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q11_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |ORDER BY price DESC, o_orderkey LIMIT 25""".stripMargin,
    "q12_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |ORDER BY o_orderstatus, o_custkey, o_orderkey LIMIT 100""".stripMargin,
    "q13_setops" ->
      """SELECT op, n FROM (
        |  SELECT 'union' AS op, count(*) AS n FROM (
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    UNION
        |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |  UNION ALL
        |  SELECT 'intersect' AS op, count(*) AS n FROM (
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    INTERSECT
        |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |  UNION ALL
        |  SELECT 'except' AS op, count(*) AS n FROM (
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    EXCEPT
        |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |) ORDER BY op""".stripMargin,
    "q14_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY 1, 2""".stripMargin,
    "q15_agg_stats" ->
      """SELECT round(min(l_extendedprice), 2) AS min_price,
        |       round(max(l_extendedprice), 2) AS max_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem""".stripMargin,
    "q16_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q17_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |       coalesce(o_orderpriority, 'ALL') AS pri,
        |       count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY st, pri""".stripMargin,
    "q18_casewhen_agg" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_scalar_funcs" ->
      """SELECT p_partkey,
        |       upper(substring(p_name, 1, 8)) AS name8,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       concat_ws('|', p_brand, p_type) AS brand_type,
        |       abs(p_size - 25) AS size_dev,
        |       round(p_retailprice * 1.1, 2) AS price_up,
        |       p_partkey % 7 AS k_mod7
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q20_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q21_json_funcs" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin,
  )

  private val windowOracles: Map[String, String] = Map(
    "q22_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY o_custkey""".stripMargin,
    "q23_window_running_sum" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM events ORDER BY event_id""".stripMargin,
    "q24_window_lag" ->
      """SELECT event_id, user_id,
        |  CAST(epoch_us(ts) - coalesce(lag(epoch_us(ts)) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id), epoch_us(ts))
        |    AS BIGINT) AS gap_us
        |FROM events ORDER BY event_id""".stripMargin,
    "q25_window_moving_avg" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(floor(
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w * 1.0
        |    / count(*) OVER w) AS BIGINT) AS mavg_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q26_window_ranking" ->
      """SELECT c_custkey,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS prank
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
  )

  /** Shared edge-derivation CTEs for the graph oracles: `e` is the directed
    * deduped edge list, `ue` its symmetrization — identical semantics to
    * GraphOps.directedEdges/undirectedEdges. */
  private val edgeCte: String =
    """e AS (
      |  SELECT DISTINCT o_custkey AS src,
      |         1 + (o_orderkey % (SELECT max(c_custkey) FROM customer)) AS dst
      |  FROM orders
      |), ue AS (
      |  SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e
      |)""".stripMargin

  private val graphOracles: Map[String, String] = Map(
    "q30_adjacency_build" ->
      s"""WITH $edgeCte,
        |adj AS (
        |  SELECT src, count(*) AS degree,
        |         string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst) AS nbrs
        |  FROM ue GROUP BY src)
        |SELECT src,
        |  CAST(coalesce(sum(degree) OVER (ORDER BY src
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS first_nbr,
        |  CAST(degree AS BIGINT) AS degree, nbrs
        |FROM adj ORDER BY src""".stripMargin,
    "q31_degrees" ->
      s"""WITH $edgeCte,
        |o AS (SELECT src AS node, count(*) AS out_deg FROM e GROUP BY 1),
        |i AS (SELECT dst AS node, count(*) AS in_deg FROM e GROUP BY 1)
        |SELECT coalesce(o.node, i.node) AS node,
        |       CAST(coalesce(out_deg, 0) AS BIGINT) AS out_deg,
        |       CAST(coalesce(in_deg, 0) AS BIGINT) AS in_deg
        |FROM o FULL OUTER JOIN i ON o.node = i.node
        |ORDER BY node""".stripMargin,
    "q32_bfs" ->
      s"""WITH RECURSIVE $edgeCte,
        |walk(node, d) AS (
        |  SELECT CAST(1 AS BIGINT), 0
        |  UNION
        |  SELECT ue.dst, w.d + 1 FROM walk w JOIN ue ON ue.src = w.node
        |  WHERE w.d < 10
        |)
        |SELECT node, CAST(min(d) AS BIGINT) AS dist
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,
    "q33_sssp" ->
      s"""WITH RECURSIVE $edgeCte,
        |walk(node, hops, cost) AS (
        |  SELECT CAST(1 AS BIGINT), 0, CAST(0 AS BIGINT)
        |  UNION
        |  SELECT ue.dst, w.hops + 1,
        |         w.cost + ((ue.src * 31 + ue.dst) % 7) + 1
        |  FROM walk w JOIN ue ON ue.src = w.node
        |  WHERE w.hops < 8
        |)
        |SELECT node, CAST(min(cost) AS BIGINT) AS cost
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,
    "q34_triangle_count" ->
      s"""WITH $edgeCte,
        |ce AS (SELECT src AS a, dst AS b FROM ue WHERE src < dst)
        |SELECT count(*) AS n_triangles
        |FROM ce e1
        |JOIN ce e2 ON e2.a = e1.b
        |JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin,
    "q35_connected_components" ->
      s"""WITH RECURSIVE $edgeCte,
        |walk(node, reach) AS (
        |  SELECT DISTINCT src, src FROM ue
        |  UNION
        |  SELECT w.node, ue.dst FROM walk w JOIN ue ON ue.src = w.reach
        |)
        |SELECT node, CAST(min(reach) AS BIGINT) AS component
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    relationalOracles ++ windowOracles ++ graphOracles

  /** Queries intentionally shipped without a SQL oracle (non-SQL-expressible
    * semantics — the driver records a weaker rows-only check for these). */
  def rowsOnlyQueries: Set[String] = Set(
    "q36_pagerank", // float fixpoint — no exact SQL oracle; invariants unit-tested
  )

  /** Headline queries timed by Bench (one per operator family). */
  def benchQueries: Seq[String] = Seq(
    "q02_scan_filter_count", "q04_groupby_hash", "q06_hashjoin_sum",
    "q07_shuffle_join_agg", "q08_star_join", "q11_topk", "q16_rollup")
}
