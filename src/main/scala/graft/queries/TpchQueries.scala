package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 TPC-H completion: the remaining classical query shapes
  * expressible on the driver's star schema (TESTDATA.md has no `partsupp`,
  * `l_shipmode`, or `l_commitdate`/`l_receiptdate`, so Q2/Q11/Q16/Q20 are
  * out of reach and Q12/Q21 use `l_shipdate > o_orderdate` as the "late"
  * predicate).
  *
  * Shapes covered here: two-sided nation-pair join with disjunctive
  * dimension predicate (Q7), market-share ratio over a star join (Q8),
  * profit rollup by nation×year (Q9), CASE-conditional counts (Q12),
  * outer-join histogram-of-counts (Q13), argmax-by-scalar-subquery (Q15),
  * correlated-average restriction rewritten multiplication-only (Q17),
  * OR-of-ANDs pushdown join (Q19), sole-late-supplier exists/not-exists
  * (Q21), and global-average + anti-join aggregate (Q22).
  *
  * Cross-engine determinism follows RelationalQueries: sums go through
  * DECIMAL (exact, order-independent), outputs cast to DOUBLE/BIGINT,
  * divisions/comparisons in doubles use the IDENTICAL expression tree in
  * both engines. Averages never divide: `x > avg(y)` is rewritten
  * `x * count > sum` on exact values.
  *
  * Scale notes: every dimension join is broadcast; orders⋈lineitem is the
  * one fact-fact shuffle, keyed on the order key both times so the
  * exchange is reusable; Q13's outer join shuffles on custkey (AQE handles
  * the null/skew side); Q15/Q22's global scalar (max / avg) is a one-row
  * broadcast, not a driver collect.
  */
object TpchQueries {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(28,10)")
  private def dec38(c: Column): Column = c.cast("decimal(38,10)")
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)
  private val rev = () =>
    dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  val all: Map[String, Q] = Map(
    // Q7 volume shipping: revenue between two specific nations, either
    // direction, by ship year. Both nation dims broadcast twice under
    // different aliases; the disjunctive pair predicate prunes early.
    "q7_volume_shipping" -> ((s, dir) => {
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(rev()).cast("double").as("revenue"))
    }),

    // Q8 market share: NATION_7's share of ECONOMY-part revenue delivered
    // to ASIA customers, by order year. Ratio of two exact decimal sums,
    // one double division at the end.
    "q8_market_share" -> ((s, dir) => {
      val asiaNations = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")
            .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk"))
      val suppNation = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_type") === "ECONOMY")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaNations), col("c_nationkey") === col("c_nk"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_7", rev())
            .otherwise(dec(lit(0.0)))).as("nat_dec"),
          sum(rev()).as("tot_dec"))
        .select(col("o_year"),
          (col("nat_dec").cast("double") / col("tot_dec").cast("double"))
            .as("mkt_share"))
    }),

    // Q9 profit proxy (no partsupp → no supplycost term): revenue on parts
    // whose name contains 'red', by supplier nation and ship year.
    "q9_product_profit" -> ((s, dir) => {
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("nation"))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_name").contains("red"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("s_nk"))
        .groupBy(col("nation"),
          year(col("l_shipdate")).cast("long").as("o_year"))
        .agg(sum(rev()).cast("double").as("sum_profit"))
    }),

    // Q12 shape (no l_shipmode → grouped by linestatus): late lines split
    // into high/low order-priority counts. Pure integer CASE aggregation.
    "q12_priority_lines" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))),

    // Q13 customer distribution: orders-per-customer histogram via a
    // right-outer join (count(col) skips the nulls of order-less
    // customers) then a second tiny aggregate.
    "q13_order_counts" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))),

    // Q15 top supplier: suppliers achieving the maximum quarterly revenue.
    // The global max is a one-row aggregate broadcast back (no driver
    // collect); equality is decided on the EXACT decimal, output cast.
    "q15_top_supplier" -> ((s, dir) => {
      val revenue = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(rev()).as("total_dec"))
      val mx = revenue.agg(max(col("total_dec")).as("max_dec"))
      revenue.join(broadcast(mx), col("total_dec") === col("max_dec"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_dec").cast("double").as("total_revenue"))
    }),

    // Q17 small-quantity revenue: Brand#3 lines with quantity below 20% of
    // the part's average. `qty < avg/5` is evaluated as
    // `qty * 5 * count < sum` — multiplication-only on exact values, no
    // engine-specific AVG rounding. Both sides of the double comparison
    // use the identical expression tree in DuckDB.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val brandParts = broadcast(t(s, dir, "part")
        .filter(col("p_brand") === "Brand#3")
        .select(col("p_partkey")))
      val perPart = li.join(brandParts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey").as("agg_partkey"))
        .agg(sum(dec38(col("l_quantity"))).as("sum_qty_dec"),
          count(lit(1)).as("cnt"))
      li.join(brandParts, col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("agg_partkey"))
        .filter(col("l_quantity") * lit(5.0) * col("cnt").cast("double") <
          col("sum_qty_dec").cast("double"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0))
          .as("avg_yearly"))
    }),

    // Q19 disjunctive predicate join: OR-of-ANDs over brand/size/quantity.
    // Catalyst extracts the common `l_partkey = p_partkey` equi-condition
    // into the hash join and keeps the disjunction as a post-join filter;
    // the brand/size arm pushes into the (broadcast) part scan.
    "q19_disjunctive" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 40)))
        .agg(sum(rev()).cast("double").as("revenue"))),

    // Q21 sole-late supplier: on multi-supplier finalized orders where
    // EXACTLY ONE supplier shipped late, count such orders per supplier.
    // The exists / not-exists pair collapses into one aggregate pass per
    // order (distinct suppliers vs distinct late suppliers) — one shuffle
    // on the order key instead of two extra self-joins.
    "q21_sole_late_supplier" -> ((s, dir) => {
      val perOrder = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("late_supp",
          when(col("l_shipdate") > col("o_orderdate"), col("l_suppkey")))
        .groupBy(col("l_orderkey"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("late_supp")).as("n_late"),
          min(col("late_supp")).as("the_late_supp"))
        .filter(col("n_supp") > 1 && col("n_late") === 1)
      perOrder
        .groupBy(col("the_late_supp"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(s, dir, "supplier")),
          col("the_late_supp") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
    }),

    // Q22 idle balances: customers with above-average positive balance and
    // no orders since 2000 (every synthetic customer has SOME order, so
    // the classical "no orders at all" arm is vacuous — the dormancy
    // cutoff keeps the anti-join shape selective), by nation. The average
    // never divides: `bal > avg` is `bal * count > sum` (exact sum through
    // the varchar-mediated double cast, identical IEEE comparison both
    // engines).
    "q22_idle_balance" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val st = cust.filter(col("c_acctbal") > 0.0)
        .agg(sum(dec38(col("c_acctbal"))).cast("double").as("sbal"),
          count(lit(1)).cast("double").as("cnt"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      cust.crossJoin(broadcast(st))
        .filter(col("c_acctbal") * col("cnt") > col("sbal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
    })
  )

  private val D = "CAST(CAST(%s AS VARCHAR) AS DOUBLE)"
  private def dd(e: String) = D.format(e)
  private val revSql = "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))"

  val oracles: Map[String, String] = Map(
    "q7_volume_shipping" ->
      s"""SELECT supp_nation, cust_nation, l_year, ${dd("rev_dec")} AS revenue
          FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   sum($revSql) AS rev_dec
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
            GROUP BY 1, 2, 3)""",
    "q8_market_share" ->
      s"""SELECT o_year, ${dd("nat_dec")} / ${dd("tot_dec")} AS mkt_share
          FROM (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   sum(CASE WHEN n1.n_name = 'NATION_7'
                     THEN l_extendedprice * (1.0 - l_discount)
                     ELSE 0.0 END::DECIMAL(28,10)) AS nat_dec,
                   sum($revSql) AS tot_dec
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region ON n2.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
            GROUP BY 1)""",
    "q9_product_profit" ->
      s"""SELECT nation, o_year, ${dd("profit_dec")} AS sum_profit
          FROM (
            SELECT n_name AS nation,
                   CAST(year(l_shipdate) AS BIGINT) AS o_year,
                   sum($revSql) AS profit_dec
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
            GROUP BY 1, 2)""",
    "q12_priority_lines" ->
      """SELECT l_linestatus,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate > o_orderdate
         GROUP BY l_linestatus""",
    "q13_order_counts" ->
      """SELECT c_count, count(*) AS custdist
         FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey)
         GROUP BY c_count""",
    "q15_top_supplier" ->
      s"""WITH revenue AS (
            SELECT l_suppkey, sum($revSql) AS total_dec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
          SELECT s_suppkey, s_name, ${dd("total_dec")} AS total_revenue
          FROM revenue JOIN supplier ON l_suppkey = s_suppkey
          WHERE total_dec = (SELECT max(total_dec) FROM revenue)""",
    "q17_small_qty_revenue" ->
      s"""WITH brand_parts AS (
            SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'),
          per_part AS (
            SELECT p_partkey AS agg_partkey,
                   sum(CAST(l_quantity AS DECIMAL(38,10))) AS sum_qty_dec,
                   count(*) AS cnt
            FROM lineitem JOIN brand_parts ON l_partkey = p_partkey
            GROUP BY 1)
          SELECT ${dd("sum(CAST(l_extendedprice AS DECIMAL(28,10)))")} / 7.0
                   AS avg_yearly
          FROM lineitem
          JOIN brand_parts ON l_partkey = p_partkey
          JOIN per_part ON l_partkey = agg_partkey
          WHERE l_quantity * 5.0 * CAST(cnt AS DOUBLE) < ${dd("sum_qty_dec")}""",
    "q19_disjunctive" ->
      s"""SELECT ${dd(s"sum($revSql)")} AS revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                 AND l_quantity BETWEEN 1 AND 20)
             OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                 AND l_quantity BETWEEN 10 AND 30)
             OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                 AND l_quantity BETWEEN 20 AND 40)""",
    "q21_sole_late_supplier" ->
      """SELECT s_suppkey, s_name, numwait
         FROM (
           SELECT the_late_supp, count(*) AS numwait
           FROM (
             SELECT l_orderkey,
                    count(DISTINCT l_suppkey) AS n_supp,
                    count(DISTINCT CASE WHEN l_shipdate > o_orderdate
                      THEN l_suppkey END) AS n_late,
                    min(CASE WHEN l_shipdate > o_orderdate
                      THEN l_suppkey END) AS the_late_supp
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             WHERE o_orderstatus = 'F'
             GROUP BY l_orderkey)
           WHERE n_supp > 1 AND n_late = 1
           GROUP BY the_late_supp)
         JOIN supplier ON the_late_supp = s_suppkey""",
    "q22_idle_balance" ->
      s"""WITH st AS (
            SELECT ${dd("sum(CAST(c_acctbal AS DECIMAL(38,10)))")} AS sbal,
                   CAST(count(*) AS DOUBLE) AS cnt
            FROM customer WHERE c_acctbal > 0.0)
          SELECT c_nationkey, count(*) AS numcust,
                 ${dd("sum(CAST(c_acctbal AS DECIMAL(28,10)))")} AS totacctbal
          FROM customer, st
          WHERE c_acctbal * st.cnt > st.sbal
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderdate >= TIMESTAMP '2000-01-01')
          GROUP BY c_nationkey"""
  )
}
