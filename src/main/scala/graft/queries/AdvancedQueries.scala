package graft.queries

import graft.Tables

/** Wider SQL surface: subqueries (EXISTS / IN / correlated scalar),
  * ROLLUP, set operations, richer window functions, HAVING, date/string
  * scalar functions. Everything a Hive user ran over DWRF tables lands in
  * this engine through Catalyst; these queries pin that surface with
  * hash-exact DuckDB parity. All shared-text SQL (identical in both
  * engines, incl. explicit NULLS FIRST where ROLLUP introduces nulls).
  */
object AdvancedQueries extends QueryPack {

  private def shared(name: String, sql: String): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) }, Some(sql))

  // TPC-H Q4-flavored: orders having at least one discounted line item.
  private val existsSql = s"""
    |SELECT o_orderpriority, COUNT(*) AS n_orders
    |FROM orders
    |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    |  AND EXISTS (
    |    SELECT 1 FROM lineitem
    |    WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
    |GROUP BY o_orderpriority
    |ORDER BY o_orderpriority
    |""".stripMargin.trim

  // Correlated scalar subquery: cheapest part per brand.
  private val scalarSubSql = """
    |SELECT p_brand, p_partkey, p_name, p_retailprice
    |FROM part p
    |WHERE p_retailprice = (
    |  SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand)
    |ORDER BY p_brand, p_partkey
    |""".stripMargin.trim

  // ROLLUP over region/nation revenue (NULLS FIRST pinned: Spark and
  // DuckDB default null ordering differs).
  private val rollupSql = s"""
    |SELECT r_name, n_name,
    |  ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
    |  COUNT(*) AS n_items
    |FROM lineitem
    |JOIN supplier ON l_suppkey = s_suppkey
    |JOIN nation ON s_nationkey = n_nationkey
    |JOIN region ON n_regionkey = r_regionkey
    |GROUP BY ROLLUP(r_name, n_name)
    |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    |""".stripMargin.trim

  // IN-subquery + anti pattern via NOT IN on a guaranteed-non-null set.
  private val inSubSql = """
    |SELECT c_mktsegment, COUNT(*) AS n_customers
    |FROM customer
    |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    |GROUP BY c_mktsegment
    |ORDER BY c_mktsegment
    |""".stripMargin.trim

  // Set operations over derived key sets.
  private val setOpsSql = """
    |SELECT 'both' AS segment_kind, COUNT(*) AS n FROM (
    |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    |  INTERSECT
    |  SELECT o_custkey FROM orders WHERE o_totalprice > 200000) t1
    |UNION ALL
    |SELECT 'building_only' AS segment_kind, COUNT(*) AS n FROM (
    |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    |  EXCEPT
    |  SELECT o_custkey FROM orders WHERE o_totalprice > 200000) t2
    |ORDER BY segment_kind
    |""".stripMargin.trim

  // Window battery: rank / dense_rank / lag / lead / ntile over a total
  // deterministic order.
  private val windowsSql = """
    |SELECT s_suppkey, s_name,
    |  CAST(RANK() OVER w AS BIGINT) AS bal_rank,
    |  CAST(DENSE_RANK() OVER w AS BIGINT) AS bal_dense_rank,
    |  CAST(NTILE(4) OVER w AS BIGINT) AS bal_quartile,
    |  LAG(s_suppkey) OVER w AS prev_supp,
    |  LEAD(s_suppkey) OVER w AS next_supp
    |FROM supplier
    |WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
    |ORDER BY s_suppkey
    |""".stripMargin.trim

  // HAVING over join-aggregate.
  private val havingSql = s"""
    |SELECT l_suppkey, COUNT(*) AS n_items,
    |  ${dsum("l_extendedprice")} AS total_price
    |FROM lineitem
    |GROUP BY l_suppkey
    |HAVING COUNT(*) > 100
    |ORDER BY l_suppkey
    |""".stripMargin.trim

  // Scalar function battery: dates + strings (dialect-shared subset).
  private val scalarsSql = """
    |SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
    |  CAST(month(o_orderdate) AS BIGINT) AS order_month,
    |  COUNT(*) AS n_orders,
    |  COUNT(DISTINCT upper(o_orderpriority)) AS n_priorities,
    |  MIN(substr(o_orderpriority, 1, 1)) AS min_prio_digit,
    |  CAST(MAX(length(o_orderpriority)) AS BIGINT) AS max_prio_len
    |FROM orders
    |GROUP BY year(o_orderdate), month(o_orderdate)
    |ORDER BY order_year, order_month
    |""".stripMargin.trim

  // TPC-H Q8-style market share: nation's fraction of regional revenue
  // per year — nested aggregation over a 6-table join, exact-decimal
  // numerator/denominator with one final IEEE division.
  private val marketShareSql = s"""
    |WITH rev AS (
    |  SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year, n_name,
    |    ${dsum("l_extendedprice * (1 - l_discount)")} AS nation_rev
    |  FROM lineitem
    |  JOIN orders ON l_orderkey = o_orderkey
    |  JOIN supplier ON l_suppkey = s_suppkey
    |  JOIN nation ON s_nationkey = n_nationkey
    |  JOIN region ON n_regionkey = r_regionkey
    |  WHERE r_name = 'ASIA'
    |  GROUP BY year(o_orderdate), n_name),
    |tot AS (
    |  SELECT order_year,
    |    CAST(ROUND(SUM(CAST(nation_rev AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_rev
    |  FROM rev GROUP BY order_year)
    |SELECT rev.order_year, n_name, nation_rev,
    |  nation_rev / total_rev AS mkt_share
    |FROM rev JOIN tot ON rev.order_year = tot.order_year
    |ORDER BY rev.order_year, n_name
    |""".stripMargin.trim

  // TPC-H Q9-flavored profit rollup by nation and year.
  private val profitSql = s"""
    |SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS order_year,
    |  ${dsum("l_extendedprice * (1 - l_discount) - l_quantity * (p_retailprice / 10)")} AS amount
    |FROM lineitem
    |JOIN part ON l_partkey = p_partkey
    |JOIN supplier ON l_suppkey = s_suppkey
    |JOIN orders ON l_orderkey = o_orderkey
    |JOIN nation ON s_nationkey = n_nationkey
    |WHERE p_name LIKE '%a%'
    |GROUP BY n_name, year(o_orderdate)
    |ORDER BY n_name, order_year
    |""".stripMargin.trim

  // TPC-H Q12-style shipping-mode buckets (priority classes vs lateness).
  private val q12Sql = """
    |SELECT l_linestatus,
    |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
    |    AS high_line_count,
    |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
    |    AS low_line_count,
    |  COUNT(*) AS n_items
    |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    |WHERE l_shipdate > o_orderdate
    |GROUP BY l_linestatus
    |ORDER BY l_linestatus
    |""".stripMargin.trim

  // GROUPING SETS with GROUPING() disambiguation (supersets ROLLUP:
  // arbitrary grouping combinations in one pass).
  private val groupingSetsSql = s"""
    |SELECT
    |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
    |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
    |  l_returnflag, l_linestatus,
    |  ${dsum("l_quantity")} AS sum_qty,
    |  COUNT(*) AS n_items
    |FROM lineitem
    |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
    |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    |""".stripMargin.trim

  // LATERAL correlated derived table: top order per customer segment
  // sample (bounded key range keeps both engines' row counts identical).
  private val lateralSql = s"""
    |SELECT c_custkey, c_mktsegment, t.o_orderkey, t.o_totalprice
    |FROM customer,
    |LATERAL (
    |  SELECT o_orderkey, o_totalprice
    |  FROM orders
    |  WHERE o_custkey = c_custkey
    |  ORDER BY o_totalprice DESC, o_orderkey
    |  LIMIT 1) AS t
    |WHERE c_custkey <= 200
    |ORDER BY c_custkey
    |""".stripMargin.trim

  // CUBE over two dimensions (all 4 grouping combinations in one pass).
  private val cubeSql = s"""
    |SELECT
    |  CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
    |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
    |  c_mktsegment, o_orderpriority,
    |  COUNT(*) AS n_orders,
    |  ${dsum("o_totalprice")} AS total_price
    |FROM orders JOIN customer ON o_custkey = c_custkey
    |GROUP BY CUBE(c_mktsegment, o_orderpriority)
    |ORDER BY g_seg, g_pri, c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST
    |""".stripMargin.trim

  // Ordered-set aggregates: exact interpolated percentiles — both engines
  // sort and linearly interpolate, so values agree bit-for-bit after a
  // 6-digit round.
  private val percentilesSql = """
    |SELECT l_returnflag,
    |  CAST(ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity), 6) AS DOUBLE) AS p50_qty,
    |  CAST(ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_quantity), 6) AS DOUBLE) AS p90_qty,
    |  CAST(ROUND(PERCENTILE_CONT(0.99) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS DOUBLE) AS p99_price
    |FROM lineitem
    |GROUP BY l_returnflag
    |ORDER BY l_returnflag
    |""".stripMargin.trim

  // Window frame battery: explicit ROWS frames (moving + running sums)
  // and a value-RANGE frame over a numeric order key, plus FIRST_VALUE
  // over a partitioned order. Window sums go through exact DECIMAL so
  // frame evaluation order can never change a bit of the output.
  private val windowFramesSql = """
    |SELECT s_suppkey,
    |  CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(18,6))) OVER
    |    (ORDER BY s_suppkey ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 2)
    |    AS DOUBLE) AS mov_sum,
    |  CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(18,6))) OVER
    |    (ORDER BY s_suppkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
    |    AS DOUBLE) AS run_sum,
    |  CAST(COUNT(*) OVER
    |    (ORDER BY s_nationkey RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING)
    |    AS BIGINT) AS near_nation_n,
    |  CAST(FIRST_VALUE(s_suppkey) OVER
    |    (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    |    AS BIGINT) AS nation_top
    |FROM supplier
    |ORDER BY s_suppkey
    |""".stripMargin.trim

  // Ordered string aggregation (LISTAGG semantics). The Spark side sorts
  // the collected list explicitly (sort_array), so the result is
  // deterministic regardless of collect_list's arrival order; the oracle
  // is DuckDB's string_agg with an in-aggregate ORDER BY.
  private def listAgg(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      |SELECT s_nationkey,
      |  array_join(sort_array(collect_list(s_name)), ',') AS names,
      |  COUNT(*) AS n_suppliers
      |FROM supplier
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey
      |""".stripMargin.trim)
  }

  private val listAggOracle = """
    |SELECT s_nationkey,
    |  string_agg(s_name, ',' ORDER BY s_name) AS names,
    |  COUNT(*) AS n_suppliers
    |FROM supplier
    |GROUP BY s_nationkey
    |ORDER BY s_nationkey
    |""".stripMargin.trim

  // TPC-H Q13 shape: order-count distribution INCLUDING zero-order
  // customers — the left-outer-join + double-aggregation pattern.
  private val custDistSql = """
    |SELECT c_count, COUNT(*) AS custdist
    |FROM (
    |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
    |  FROM customer
    |  LEFT OUTER JOIN orders
    |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    |  GROUP BY c_custkey) c_orders
    |GROUP BY c_count
    |ORDER BY custdist DESC, c_count DESC
    |""".stripMargin.trim

  // TPC-H Q18 shape: large-volume orders via HAVING-subquery IN, then a
  // three-way join re-aggregation over the survivors.
  private val bigOrdersSql = s"""
    |SELECT c_name, c_custkey, o_orderkey, o_totalprice,
    |  ${dsum("l_quantity", 0)} AS total_qty
    |FROM customer
    |JOIN orders ON c_custkey = o_custkey
    |JOIN lineitem ON o_orderkey = l_orderkey
    |WHERE o_orderkey IN (
    |  SELECT l_orderkey FROM lineitem
    |  GROUP BY l_orderkey
    |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250)
    |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
    |ORDER BY o_totalprice DESC, o_orderkey
    |LIMIT 100
    |""".stripMargin.trim

  // TPC-H Q21 shape (adapted to the fixture schema: shipdate stands in
  // for the missing receipt/commit dates): for 'F' orders, the supplier
  // whose line shipped LAST while at least one other supplier also
  // participated — EXISTS + correlated NOT EXISTS double-nesting.
  private val lateSupplierSql = """
    |SELECT s_name, COUNT(*) AS numwait
    |FROM supplier
    |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    |JOIN orders ON o_orderkey = l1.l_orderkey
    |WHERE o_orderstatus = 'F'
    |  AND EXISTS (
    |    SELECT 1 FROM lineitem l2
    |    WHERE l2.l_orderkey = l1.l_orderkey
    |      AND l2.l_suppkey <> l1.l_suppkey)
    |  AND NOT EXISTS (
    |    SELECT 1 FROM lineitem l3
    |    WHERE l3.l_orderkey = l1.l_orderkey
    |      AND l3.l_suppkey <> l1.l_suppkey
    |      AND l3.l_shipdate > l1.l_shipdate)
    |GROUP BY s_name
    |ORDER BY numwait DESC, s_name
    |LIMIT 50
    |""".stripMargin.trim

  // TPC-H Q22 shape: above-average-balance customers with no URGENT
  // orders — uncorrelated scalar average + correlated anti-existence
  // (the priority predicate keeps the survivor set non-empty at every
  // fixture SF, unlike the literal "no orders at all").
  private val idleRichSql = s"""
    |SELECT c_mktsegment, COUNT(*) AS numcust,
    |  ${dsum("c_acctbal")} AS total_acctbal
    |FROM customer
    |WHERE c_acctbal > (
    |    SELECT ${davg("c_acctbal")} FROM customer WHERE c_acctbal > 0)
    |  AND NOT EXISTS (SELECT 1 FROM orders
    |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    |GROUP BY c_mktsegment
    |ORDER BY c_mktsegment
    |""".stripMargin.trim

  // TPC-H Q7 shape: bilateral trade volume between two nations by ship
  // year — the double-nation-join + year-extraction rollup.
  private val tradeVolumeSql = s"""
    |SELECT supp_nation, cust_nation, l_year,
    |  ${dsum("volume")} AS revenue
    |FROM (
    |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
    |    l_extendedprice * (1 - l_discount) AS volume
    |  FROM supplier
    |  JOIN lineitem ON s_suppkey = l_suppkey
    |  JOIN orders ON o_orderkey = l_orderkey
    |  JOIN customer ON c_custkey = o_custkey
    |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
    |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
    |  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    |     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')) shipping
    |GROUP BY supp_nation, cust_nation, l_year
    |ORDER BY supp_nation, cust_nation, l_year
    |""".stripMargin.trim

  // TPC-H Q10 shape: customers ranked by returned-item revenue.
  private val returnsRevenueSql = s"""
    |SELECT c_custkey, c_name,
    |  ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
    |  c_acctbal, n_name
    |FROM customer
    |JOIN orders ON c_custkey = o_custkey
    |JOIN lineitem ON l_orderkey = o_orderkey
    |JOIN nation ON c_nationkey = n_nationkey
    |WHERE l_returnflag = 'R'
    |GROUP BY c_custkey, c_name, c_acctbal, n_name
    |ORDER BY revenue DESC, c_custkey
    |LIMIT 20
    |""".stripMargin.trim

  override val all: Seq[Q] = Seq(
    shared("adv_grouping_sets", groupingSetsSql),
    shared("adv_lateral", lateralSql),
    shared("adv_cube", cubeSql),
    shared("adv_percentiles", percentilesSql),
    shared("adv_market_share", marketShareSql),
    shared("adv_profit_by_nation", profitSql),
    shared("adv_priority_buckets", q12Sql),
    shared("adv_exists_subquery", existsSql),
    shared("adv_scalar_subquery", scalarSubSql),
    shared("adv_rollup", rollupSql),
    shared("adv_in_subquery", inSubSql),
    shared("adv_set_ops", setOpsSql),
    shared("adv_window_battery", windowsSql),
    shared("adv_having", havingSql),
    shared("adv_scalar_funcs", scalarsSql),
    shared("adv_window_frames", windowFramesSql),
    Q("adv_listagg", listAgg, Some(listAggOracle)),
    shared("adv_custdist", custDistSql),
    shared("adv_big_orders", bigOrdersSql),
    shared("adv_late_supplier", lateSupplierSql),
    shared("adv_idle_rich", idleRichSql),
    shared("adv_trade_volume", tradeVolumeSql),
    shared("adv_returns_revenue", returnsRevenueSql),
  )
}
