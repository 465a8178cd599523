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

  // ------------------------------------------------------------------
  // Round 11: the remaining TPC-H query shapes. The fixture has no
  // partsupp table, so Q2/Q11/Q16/Q20 derive the supplier-part
  // relationship from lineitem (who actually shipped which part);
  // every adaptation keeps the original query's SIGNATURE — the
  // correlated min-cost subquery, the HAVING-over-global-fraction,
  // the distinct-supplier rollup, the quantity-threshold semi-join.

  // TPC-H Q2 shape: cheapest supplier per part in a region — the
  // correlated min-over-a-join subquery. Supply cost := the supplier's
  // best observed unit price for the part (MIN of per-row IEEE
  // divisions — order-independent, so oracle-exact).
  private val minCostSupplierSql = """
    |WITH supply AS (
    |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
    |    MIN(l_extendedprice / l_quantity) AS ps_supplycost
    |  FROM lineitem
    |  GROUP BY l_partkey, l_suppkey)
    |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    |FROM part
    |JOIN supply ON p_partkey = ps_partkey
    |JOIN supplier ON s_suppkey = ps_suppkey
    |JOIN nation ON s_nationkey = n_nationkey
    |JOIN region ON n_regionkey = r_regionkey
    |WHERE p_size = 15 AND p_type = 'SMALL' AND r_name = 'ASIA'
    |  AND ps_supplycost = (
    |    SELECT MIN(s2.ps_supplycost)
    |    FROM supply s2
    |    JOIN supplier sp ON sp.s_suppkey = s2.ps_suppkey
    |    JOIN nation n2 ON sp.s_nationkey = n2.n_nationkey
    |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    |    WHERE s2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
    |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    |LIMIT 100
    |""".stripMargin.trim

  // TPC-H Q11 shape: parts whose shipped value from one nation's
  // suppliers stands out against that nation's total — the
  // HAVING-against-a-global-scalar signature. TPC-H's literal
  // 0.0001/SF fraction is scale-SENSITIVE (at sf0.1 no part clears a
  // fixed 0.001 of the total and the bench's no-rows guard rightly
  // fails the run), so the threshold is 1.5x the MEAN part value —
  // same plan shape, nonzero survivors at every fixture SF.
  private val partValueStockSql = s"""
    |SELECT l_partkey, ${dsum("l_extendedprice")} AS part_value
    |FROM lineitem
    |JOIN supplier ON l_suppkey = s_suppkey
    |JOIN nation ON s_nationkey = n_nationkey
    |WHERE n_name = 'NATION_3'
    |GROUP BY l_partkey
    |HAVING ${dsum("l_extendedprice")} > (
    |  SELECT 1.5 * ${dsum("l_extendedprice")} / COUNT(DISTINCT l_partkey)
    |  FROM lineitem
    |  JOIN supplier ON l_suppkey = s_suppkey
    |  JOIN nation ON s_nationkey = n_nationkey
    |  WHERE n_name = 'NATION_3')
    |ORDER BY part_value DESC, l_partkey
    |""".stripMargin.trim

  // TPC-H Q14 shape: promo revenue share over a ship-date window — the
  // conditional-aggregate-ratio signature. The ratio is ONE IEEE
  // division of two decimal-exact sums, so it is bit-deterministic.
  private val promoRevenueSql = s"""
    |SELECT promo_revenue, total_revenue,
    |  CAST(ROUND(100.0 * promo_revenue / total_revenue, 6) AS DOUBLE)
    |    AS promo_pct
    |FROM (
    |  SELECT
    |    ${dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
    |      AS promo_revenue,
    |    ${dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
    |  FROM lineitem
    |  JOIN part ON l_partkey = p_partkey
    |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00')
    |""".stripMargin.trim

  // TPC-H Q15 shape: the top supplier(s) by quarterly revenue — a CTE
  // referenced twice (join + MAX subquery), revenue equality on the
  // decimal-exact rounded sum.
  private val topSupplierSql = s"""
    |WITH revenue AS (
    |  SELECT l_suppkey AS supplier_no,
    |    ${dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
    |  FROM lineitem
    |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    |  GROUP BY l_suppkey)
    |SELECT s_suppkey, s_name, total_revenue
    |FROM supplier
    |JOIN revenue ON s_suppkey = supplier_no
    |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    |ORDER BY s_suppkey
    |""".stripMargin.trim

  // TPC-H Q16 shape: how many distinct suppliers shipped each part
  // profile, excluding a brand and a type — COUNT(DISTINCT) under a
  // negated filter battery.
  private val supplierVarietySql = """
    |SELECT p_brand, p_type, p_size,
    |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
    |FROM part
    |JOIN lineitem ON l_partkey = p_partkey
    |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
    |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    |GROUP BY p_brand, p_type, p_size
    |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    |""".stripMargin.trim

  // TPC-H Q17 shape: revenue that small-quantity orders of one brand
  // represent — the per-part correlated average-quantity threshold.
  private val smallQtyRevenueSql = s"""
    |SELECT CAST(ROUND(total_ep / 7.0, 2) AS DOUBLE) AS avg_yearly
    |FROM (
    |  SELECT ${dsum("l_extendedprice")} AS total_ep
    |  FROM lineitem
    |  JOIN part ON p_partkey = l_partkey
    |  WHERE p_brand = 'Brand#3'
    |    AND l_quantity < (
    |      SELECT 0.2 * ${davg("l2.l_quantity")}
    |      FROM lineitem l2 WHERE l2.l_partkey = p_partkey))
    |""".stripMargin.trim

  // TPC-H Q19 shape: disjunctive brand/size/quantity predicate batteries
  // — the OR-of-conjunctions plan the optimizer must keep join-pushable.
  private val brandDisjunctionSql = s"""
    |SELECT ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
    |  COUNT(*) AS n_items
    |FROM lineitem
    |JOIN part ON p_partkey = l_partkey
    |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
    |    AND l_quantity >= 1 AND l_quantity <= 11)
    |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
    |    AND l_quantity >= 10 AND l_quantity <= 20)
    |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
    |    AND l_quantity >= 20 AND l_quantity <= 30)
    |""".stripMargin.trim

  // TPC-H Q20 shape: suppliers of one nation who shipped a meaningful
  // volume of a part family in a year — the GROUP-BY-HAVING semi-join.
  private val excessShippersSql = """
    |SELECT s_name, s_acctbal
    |FROM supplier
    |JOIN nation ON s_nationkey = n_nationkey
    |WHERE n_name = 'NATION_5'
    |  AND s_suppkey IN (
    |    SELECT l_suppkey
    |    FROM lineitem
    |    JOIN part ON p_partkey = l_partkey
    |    WHERE p_name LIKE 'small%'
    |      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    |      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    |    GROUP BY l_suppkey
    |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) >
    |      CAST(100 AS DECIMAL(18,6)))
    |ORDER BY s_name
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
    shared("adv_mincost_supplier", minCostSupplierSql),
    shared("adv_part_value_stock", partValueStockSql),
    shared("adv_promo_revenue", promoRevenueSql),
    shared("adv_top_supplier", topSupplierSql),
    shared("adv_supplier_variety", supplierVarietySql),
    shared("adv_small_qty_revenue", smallQtyRevenueSql),
    shared("adv_brand_disjunction", brandDisjunctionSql),
    shared("adv_excess_shippers", excessShippersSql),
  )
}
