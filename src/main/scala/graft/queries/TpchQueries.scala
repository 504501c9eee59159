package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 TPC-H completion: the remaining classical query shapes
  * expressible on the driver's star schema (TESTDATA.md has no
  * `l_shipmode` or `l_commitdate`/`l_receiptdate`, so Q12/Q21 use
  * `l_shipdate > o_orderdate` as the "late" predicate).
  *
  * TESTDATA also has no `partsupp`, so Q2/Q11/Q16/Q20 run against a
  * partsupp DERIVED deterministically from the part×supplier keys — both
  * engines build the identical table (see [[partsupp]] / `psCte`), so
  * the four classic supplier/part join shapes are still oracle-checked.
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

  /** Derived `partsupp`: dbgen's 4-suppliers-per-part bridge (TPC-H spec
    * §4.2.3, adapted to this dataset's 0-based keys) with availqty /
    * supplycost drawn from the portable hash, so Spark and the DuckDB
    * oracle CTE construct bit-identical tables from `part` × `supplier`
    * alone. Supplycost is exact at 2 decimal places (integer cents / 100
    * in both engines — the same IEEE division), so Q2's min-equality
    * join is safe on the double.
    *
    * Scale: one row per (part, i<4) — a pure flatMap over the part scan
    * plus a 1-row broadcast for the supplier count; no shuffle. At 100 TB
    * a real partsupp would be a stored table; the derivation stands in
    * for the scan.
    */
  private def partsupp(s: SparkSession, dir: String): DataFrame = {
    val scnt = t(s, dir, "supplier").agg(count(lit(1)).as("s_cnt"))
    t(s, dir, "part").select(col("p_partkey"))
      .crossJoin(broadcast(scnt))
      .select(col("p_partkey").as("ps_partkey"), col("s_cnt"),
        explode(array((0L until 4L).map(lit): _*)).as("i"))
      .withColumn("ps_suppkey",
        (col("ps_partkey") + col("i") *
          (expr("s_cnt div 4") + expr("ps_partkey div s_cnt"))) %
          col("s_cnt"))
      .withColumn("__h", graft.functions.PortableHash.h15(
        concat(col("ps_partkey").cast("string"), lit(":"),
          col("ps_suppkey").cast("string"))))
      .select(col("ps_partkey"), col("ps_suppkey"),
        (col("__h") % 9999 + 1).as("ps_availqty"),
        ((col("__h") % 99901 + 100).cast("double") / 100.0)
          .as("ps_supplycost"))
  }

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
    }),

    // Q2 minimum-cost supplier: for small STANDARD parts (size <= 10 —
    // the classic predicate is size = 15, widened so the fixture yields
    // a non-trivial result set), the EUROPE
    // supplier(s) achieving the per-part minimum supplycost. Both
    // dimension sides (filtered parts, region suppliers) broadcast; the
    // per-part min is an aggregate over the already-filtered eligible
    // set, broadcast back — one shuffle total, partsupp never moves.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val parts = broadcast(t(s, dir, "part")
        .filter(col("p_size") <= 10 && col("p_type") === "STANDARD")
        .select(col("p_partkey"), col("p_name")))
      val suppRegion = broadcast(t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
            .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name")))
      val eligible = partsupp(s, dir)
        .join(parts, col("ps_partkey") === col("p_partkey"))
        .join(suppRegion, col("ps_suppkey") === col("s_suppkey"))
      val minCost = eligible.groupBy(col("ps_partkey").as("mk"))
        .agg(min(col("ps_supplycost")).as("min_cost"))
      eligible.join(broadcast(minCost),
          col("ps_partkey") === col("mk") &&
            col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"), col("ps_supplycost"))
    }),

    // Q11 important stock: a nation's partsupp value per part, kept when
    // above a fraction of the nation's total. Exact decimal sums on both
    // branches of the HAVING; the global total is a 1-row broadcast.
    "q11_important_stock" -> ((s, dir) => {
      val natSupp = broadcast(t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
            .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey")))
      val stock = partsupp(s, dir)
        .join(natSupp, col("ps_suppkey") === col("s_suppkey"))
        .withColumn("val_dec",
          dec38(col("ps_supplycost") * col("ps_availqty")))
      val perPart = stock.groupBy(col("ps_partkey"))
        .agg(sum(col("val_dec")).as("part_dec"))
      val total = stock.agg(sum(col("val_dec")).as("total_dec"))
      perPart.crossJoin(broadcast(total))
        .filter(col("part_dec").cast("double") >
          col("total_dec").cast("double") * 0.001)
        .select(col("ps_partkey"),
          col("part_dec").cast("double").as("value"))
    }),

    // Q16 part-supplier counts: distinct suppliers per (brand, type,
    // size) bucket, excluding negative-balance suppliers (the dataset's
    // stand-in for the spec's complaints filter) via a broadcast
    // anti-join. One shuffle: the distinct-count aggregate.
    "q16_part_supplier_counts" -> ((s, dir) => {
      val complainers = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
      val parts = broadcast(t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "ECONOMY" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size")))
      partsupp(s, dir)
        .join(broadcast(complainers),
          col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(parts, col("ps_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
    }),

    // Q20 promo suppliers: ASIA suppliers holding excess stock
    // (availqty > half the 1997 shipped quantity) of 'red' parts. The
    // correlated EXISTS is rewritten as a grouped lineitem join on the
    // composite (part, supplier) key; `> half` multiplies instead of
    // dividing. Shuffles: the lineitem group-by and the partsupp⋈shipped
    // equi-join, both on the same composite key.
    "q20_promo_suppliers" -> ((s, dir) => {
      val redParts = broadcast(t(s, dir, "part")
        .filter(col("p_name").startsWith("red")).select(col("p_partkey")))
      val shipped = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(redParts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec38(col("l_quantity"))).as("qty_dec"))
      val promo = partsupp(s, dir)
        .join(redParts, col("ps_partkey") === col("p_partkey"))
        .join(shipped, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty").cast("double") * 2.0 >
          col("qty_dec").cast("double"))
        .select(col("ps_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
            .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(promo, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    })
  )

  private val D = "CAST(CAST(%s AS VARCHAR) AS DOUBLE)"
  private def dd(e: String) = D.format(e)
  private val revSql = "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))"

  /** The DuckDB dual of [[partsupp]]: same bridge formula, same hash
    * attributes. DOUBLE-origin decimals go through VARCHAR so both
    * engines round the shortest decimal representation.
    */
  private val psCte =
    s"""scnt AS (SELECT count(*) AS s_cnt FROM supplier),
        ps0 AS (
          SELECT p_partkey AS ps_partkey,
                 (p_partkey + i.i * (s_cnt // 4 + p_partkey // s_cnt))
                   % s_cnt AS ps_suppkey
          FROM part, scnt, (VALUES (0),(1),(2),(3)) i(i)),
        partsupp AS (
          SELECT ps_partkey, ps_suppkey,
                 h % 9999 + 1 AS ps_availqty,
                 CAST(h % 99901 + 100 AS DOUBLE) / 100.0 AS ps_supplycost
          FROM (SELECT ps_partkey, ps_suppkey,
                  ${graft.functions.PortableHash.duckH15(
                    "CAST(ps_partkey AS VARCHAR) || ':' || " +
                      "CAST(ps_suppkey AS VARCHAR)")} AS h
                FROM ps0))"""

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
          GROUP BY c_nationkey""",
    "q2_min_cost_supplier" ->
      s"""WITH $psCte,
          supp_region AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'),
          eligible AS (
            SELECT ps_partkey, ps_supplycost, p_partkey, p_name,
                   s_name, s_acctbal, n_name
            FROM partsupp
            JOIN part ON ps_partkey = p_partkey
            JOIN supp_region ON ps_suppkey = s_suppkey
            WHERE p_size <= 10 AND p_type = 'STANDARD'),
          min_cost AS (
            SELECT ps_partkey AS mk, min(ps_supplycost) AS min_cost
            FROM eligible GROUP BY 1)
          SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
                 ps_supplycost
          FROM eligible
          JOIN min_cost ON ps_partkey = mk AND ps_supplycost = min_cost""",
    "q11_important_stock" ->
      s"""WITH $psCte,
          nat_supp AS (
            SELECT s_suppkey FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'),
          stock AS (
            SELECT ps_partkey,
                   CAST(CAST(ps_supplycost * ps_availqty AS VARCHAR)
                     AS DECIMAL(38,10)) AS val_dec
            FROM partsupp JOIN nat_supp ON ps_suppkey = s_suppkey),
          per_part AS (
            SELECT ps_partkey, sum(val_dec) AS part_dec
            FROM stock GROUP BY 1),
          total AS (SELECT sum(val_dec) AS total_dec FROM stock)
          SELECT ps_partkey, ${dd("part_dec")} AS value
          FROM per_part, total
          WHERE ${dd("part_dec")} > ${dd("total_dec")} * 0.001""",
    "q16_part_supplier_counts" ->
      s"""WITH $psCte
          SELECT p_brand, p_type, p_size,
                 count(DISTINCT ps_suppkey) AS supplier_cnt
          FROM partsupp
          JOIN part ON ps_partkey = p_partkey
          WHERE p_brand <> 'Brand#5' AND p_type <> 'ECONOMY'
            AND p_size IN (1, 4, 9, 16, 25, 36, 49)
            AND ps_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
          GROUP BY 1, 2, 3""",
    "q20_promo_suppliers" ->
      s"""WITH $psCte,
          red_parts AS (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
          shipped AS (
            SELECT l_partkey, l_suppkey,
                   sum(CAST(l_quantity AS DECIMAL(38,10))) AS qty_dec
            FROM lineitem JOIN red_parts ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2),
          promo AS (
            SELECT DISTINCT ps_suppkey
            FROM partsupp
            JOIN red_parts ON ps_partkey = p_partkey
            JOIN shipped ON ps_partkey = l_partkey
                        AND ps_suppkey = l_suppkey
            WHERE CAST(ps_availqty AS DOUBLE) * 2.0 > ${dd("qty_dec")})
          SELECT s_suppkey, s_name, s_acctbal
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
            AND s_suppkey IN (SELECT ps_suppkey FROM promo)"""
  )
}
