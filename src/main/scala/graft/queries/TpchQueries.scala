package graft.queries

import graft.Tables

/** Classic TPC-H query corpus over the driver's star schema, giving the
  * bench a standard externally-comparable workload (the reference runs the
  * full TPC-DS 2.4 suite the same way,
  * `30-performance/TPC-DS Runner/notebooks/run_tpcds_benchmarking.py`).
  *
  * The driver's tables are a trimmed TPC-H (no partsupp; no comment,
  * commit/receipt-date, shipmode, container, address or phone columns), so
  * queries needing those are adapted: the join/aggregation shape — the
  * part that exercises the engine — is preserved, the missing-column
  * predicates are substituted (noted per query). Dates target the
  * generated 1995–2001 range. One SQL string serves both Spark and the
  * DuckDB oracle; every float aggregate is rounded with the +1e-9 epsilon
  * idiom for cross-engine hash parity.
  */
object TpchQueries extends QueryBatch {

  private def gq(name: String, sql: String): GQ =
    GQ(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) }, Some(sql))

  /** Q1 pricing summary — faithful. */
  private val h01 = gq("q160_tpch01_pricing",
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity) + 1e-9, 2) AS sum_qty,
       round(sum(l_extendedprice) + 1e-9, 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) + 1e-9, 2) AS sum_charge,
       round(avg(l_quantity) + 1e-9, 2) AS avg_qty,
       round(avg(l_extendedprice) + 1e-9, 2) AS avg_price,
       round(avg(l_discount) + 1e-9, 4) AS avg_disc,
       count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""")

  /** Q3 shipping priority — faithful minus the absent o_shippriority. */
  private val h03 = gq("q161_tpch03_ship_priority",
    """SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue,
       CAST(o_orderdate AS DATE) AS o_orderdate
       FROM customer, orders, lineitem
       WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
         AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
       GROUP BY o_orderkey, o_orderdate
       ORDER BY revenue DESC, o_orderkey LIMIT 10""")

  /** Q4 order-priority checking — adapted: the late-delivery EXISTS uses
    * l_shipdate > o_orderdate (no commit/receipt dates in the schema). */
  private val h04 = gq("q162_tpch04_order_priority",
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
       GROUP BY o_orderpriority ORDER BY o_orderpriority""")

  /** Q5 local-supplier volume — faithful. */
  private val h05 = gq("q163_tpch05_local_supplier",
    """SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue
       FROM customer, orders, lineitem, supplier, nation, region
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY n_name ORDER BY revenue DESC, n_name""")

  /** Q6 forecast revenue change — faithful. */
  private val h06 = gq("q164_tpch06_forecast_revenue",
    """SELECT round(sum(l_extendedprice * l_discount) + 1e-9, 2) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")

  /** Q7 volume shipping between two nations — faithful. */
  private val h07 = gq("q165_tpch07_volume_shipping",
    """SELECT supp_nation, cust_nation, l_year,
       round(sum(volume) + 1e-9, 2) AS revenue
       FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    CAST(extract(year FROM l_shipdate) AS INTEGER) AS l_year,
                    l_extendedprice * (1 - l_discount) AS volume
             FROM supplier, lineitem, orders, customer, nation n1, nation n2
             WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
               AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
               AND c_nationkey = n2.n_nationkey
               AND ((n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_7')
                 OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_6'))
               AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                                  AND TIMESTAMP '1998-12-31 00:00:00') shipping
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year""")

  /** Q8 national market share — faithful (p_type domain is single-word). */
  private val h08 = gq("q166_tpch08_market_share",
    """SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_8' THEN volume ELSE 0 END)
             / sum(volume) + 1e-9, 4) AS mkt_share
       FROM (SELECT CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
                    l_extendedprice * (1 - l_discount) AS volume,
                    n2.n_name AS nation
             FROM part, supplier, lineitem, orders, customer,
                  nation n1, nation n2, region
             WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
               AND l_orderkey = o_orderkey AND o_custkey = c_custkey
               AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
               AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
               AND o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                                   AND TIMESTAMP '1998-12-31 00:00:00'
               AND p_type = 'ECONOMY') all_nations
       GROUP BY o_year ORDER BY o_year""")

  /** Q9 product-type profit — adapted: amount omits ps_supplycost (no
    * partsupp table); nation/year grouping shape preserved. The amount is
    * computed in DECIMAL from the exact-2dp base columns (double→decimal
    * of a 2dp value is unambiguous in both engines), so the sum is exact
    * and order-independent; the final CAST to DOUBLE keeps the output
    * column float64 on both sides — Spark's parquet DECIMAL renders
    * `1973898.40` via pandas Decimal while DuckDB's .df() gives float64
    * `1973898.4`, which broke the driver's string-hash on trailing-zero
    * rows in round 2 even though every value matched. */
  private val h09 = gq("q167_tpch09_product_profit",
    """SELECT nation, o_year,
       CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
       FROM (SELECT n_name AS nation,
                    CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
                    CAST(l_extendedprice AS DECIMAL(12, 2))
                      * (1 - CAST(l_discount AS DECIMAL(4, 2))) AS amount
             FROM part, supplier, lineitem, orders, nation
             WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
               AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
               AND p_name LIKE '%widget%') profit
       GROUP BY nation, o_year ORDER BY nation, o_year DESC""")

  /** Q10 returned-item reporting — faithful minus absent address/phone. */
  private val h10 = gq("q168_tpch10_returned_items",
    """SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue,
       round(c_acctbal + 1e-9, 2) AS c_acctbal, n_name
       FROM customer, orders, lineitem, nation
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         AND l_returnflag = 'R' AND c_nationkey = n_nationkey
       GROUP BY c_custkey, c_name, c_acctbal, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20""")

  /** Q13 customer order-count distribution — adapted: no o_comment
    * exclusion filter (column absent). */
  private val h13 = gq("q169_tpch13_order_distribution",
    """SELECT c_count, count(*) AS custdist
       FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
             GROUP BY c_custkey) c_orders
       GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")

  /** Q14 promotion-effect revenue share — faithful. */
  private val h14 = gq("q170_tpch14_promo_effect",
    """SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS promo_revenue
       FROM lineitem, part
       WHERE l_partkey = p_partkey
         AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""")

  /** Q15 top supplier — faithful, with the revenue view's argmax done via
    * a rank() window instead of a correlated max. */
  private val h15 = gq("q171_tpch15_top_supplier",
    """WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
                round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, total_revenue
       FROM supplier,
            (SELECT supplier_no, total_revenue FROM
              (SELECT supplier_no, total_revenue,
                      rank() OVER (ORDER BY total_revenue DESC) AS rnk
               FROM revenue) ranked
             WHERE rnk = 1) top_rev
       WHERE s_suppkey = supplier_no ORDER BY s_suppkey""")

  /** Q17 small-quantity-order revenue — adapted: p_container filter
    * replaced by a p_size bound (column absent). */
  private val h17 = gq("q172_tpch17_small_quantity",
    """SELECT round(sum(l_extendedprice) / 7.0 + 1e-9, 2) AS avg_yearly
       FROM lineitem l1, part
       WHERE p_partkey = l1.l_partkey AND p_brand = 'Brand#23' AND p_size <= 10
         AND l1.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                              FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""")

  /** Q18 large-volume customers — faithful (threshold scaled to the
    * generated quantity domain). */
  private val h18 = gq("q173_tpch18_large_volume",
    """SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       round(o_totalprice + 1e-9, 2) AS o_totalprice,
       round(sum(l_quantity) + 1e-9, 2) AS sum_qty
       FROM customer, orders, lineitem
       WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                            GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
         AND c_custkey = o_custkey AND o_orderkey = l_orderkey
       GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")

  /** Q19 discounted revenue — adapted: p_container/l_shipmode disjunct
    * terms replaced by p_size bands (columns absent); OR-of-ANDs join
    * shape preserved. */
  private val h19 = gq("q174_tpch19_discounted_revenue",
    """SELECT round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue
       FROM lineitem, part
       WHERE p_partkey = l_partkey AND (
         (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
          AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
          AND l_quantity BETWEEN 20 AND 30))""")

  /** Q22 global sales opportunity — adapted: the c_phone country-code
    * prefix becomes c_nationkey membership (column absent), and the
    * no-orders anti-join is scoped to recent orders (this generator gives
    * every customer at least one order ever); the above-average-balance +
    * anti-join shape is faithful. */
  private val h22 = gq("q175_tpch22_sales_opportunity",
    """SELECT c_nationkey, count(*) AS numcust,
       round(sum(c_acctbal) + 1e-9, 2) AS totacctbal
       FROM customer
       WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
         AND c_nationkey IN (1, 3, 10, 13, 17, 21, 24)
         AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                         AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
       GROUP BY c_nationkey ORDER BY c_nationkey""")

  /** Q2 minimum-cost supplier — adapted: no partsupp table, so the supply
    * relation derives from lineitem (observed (part, supplier) pairs;
    * cost = min unit price, an exact IEEE division identical in both
    * engines — no rounding, so the correlated min-equality selects the
    * same rows). Correlated-scalar-min + 4-way dim join shape faithful. */
  private val h02 = gq("q176_tpch02_min_cost_supplier",
    """WITH supply AS (
         SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                min(l_extendedprice / l_quantity) AS ps_supplycost
         FROM lineitem GROUP BY 1, 2)
       SELECT round(s_acctbal + 1e-9, 2) AS s_acctbal, s_name, n_name,
              p_partkey, p_brand
       FROM part, supply, supplier, nation, region
       WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         AND p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'EUROPE'
         AND ps_supplycost = (SELECT min(s2.ps_supplycost)
                              FROM supply s2, supplier, nation, region
                              WHERE p_partkey = s2.ps_partkey
                                AND s2.ps_suppkey = s_suppkey
                                AND s_nationkey = n_nationkey
                                AND n_regionkey = r_regionkey
                                AND r_name = 'EUROPE')
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""")

  /** Q11 important stock — adapted: national part value derives from
    * lineitem volume instead of partsupp availqty·cost. Sums run in exact
    * DECIMAL and the fraction threshold is integer-scaled (val·1000 >
    * total) so the HAVING boundary cannot flip between engines. */
  private val h11 = gq("q177_tpch11_important_stock",
    """WITH nat_supply AS (
         SELECT l_partkey,
                sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2))) AS val
         FROM lineitem, supplier, nation
         WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
           AND n_name = 'NATION_3'
         GROUP BY l_partkey)
       SELECT l_partkey AS ps_partkey, CAST(val AS DOUBLE) AS value
       FROM nat_supply
       WHERE val * 1000 > (SELECT sum(val) FROM nat_supply)
       ORDER BY value DESC, ps_partkey""")

  /** Q12 shipping-mode priority — adapted: no l_shipmode/commit/receipt
    * dates; the mode dimension becomes l_returnflag and "late" becomes
    * shipped >60 days after ordering. The CASE-bucketed priority counting
    * join shape is faithful. */
  private val h12 = gq("q178_tpch12_shipmode_priority",
    """SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM orders, lineitem
       WHERE o_orderkey = l_orderkey
         AND l_shipdate > o_orderdate + INTERVAL 60 DAY
         AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY l_returnflag ORDER BY l_returnflag""")

  /** Q16 parts/supplier relationship — adapted: partsupp derives from
    * distinct lineitem pairs; the complaints-comment supplier exclusion
    * becomes a negative-balance NOT IN; PROMO stands in for the excluded
    * type prefix. Distinct-count + anti-membership shape faithful. */
  private val h16 = gq("q179_tpch16_parts_supplier",
    """SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
       FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
             FROM lineitem) partsupp, part
       WHERE p_partkey = ps_partkey
         AND p_brand <> 'Brand#45' AND p_type <> 'PROMO'
         AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
         AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")

  /** Q20 potential part promotion — adapted: availqty derives as total
    * shipped quantity per (part, supplier); quantities are integer-valued
    * doubles so the sums are exact in both engines. The triple-nested
    * IN/correlated-half-sum shape is faithful. */
  private val h20 = gq("q180_tpch20_part_promotion",
    """SELECT s_name, round(s_acctbal + 1e-9, 2) AS s_acctbal
       FROM supplier, nation
       WHERE s_suppkey IN (
           SELECT ps_suppkey FROM (
             SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                    sum(l_quantity) AS ps_availqty
             FROM lineitem GROUP BY 1, 2) partsupp
           WHERE ps_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE '%gear%')
             AND ps_availqty > (SELECT 0.5 * sum(l_quantity) FROM lineitem
                                WHERE l_partkey = ps_partkey
                                  AND l_suppkey = ps_suppkey
                                  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                                  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
         AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
       ORDER BY s_name""")

  /** Q21 suppliers who kept orders waiting — adapted: "late" is shipped
    * >60 days after ordering (no commit/receipt dates). The oracle keeps
    * the textbook EXISTS(other supplier) / NOT EXISTS(other late
    * supplier) pair; the Spark side runs the single-pass aggregate form:
    * Catalyst decorrelates the two EXISTS into two extra lineitem joins
    * on l_orderkey (three lineitem shuffles), while per-order
    * distinct-supplier / distinct-late-supplier counts over ONE window
    * partition-by l_orderkey express the same predicate — n_supp >= 2 ⟺
    * another supplier exists, late-supplier set = {self} ⟺ n_late = 1 —
    * with a single lineitem scan+shuffle (the window reuses the
    * join's hash partitioning), then a broadcast dim join. */
  private val h21 = GQ(
    "q181_tpch21_waiting_suppliers",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      Tables.registerAll(s, dir)
      val flagged = s.table("lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(s.table("orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("__late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      val w = Window.partitionBy("l_orderkey")
      val candidates = flagged
        .withColumn("n_supp", size(collect_set(col("l_suppkey")).over(w)))
        .withColumn("n_late", size(collect_set(
          when(col("__late"), col("l_suppkey"))).over(w)))
        .filter(col("__late") && col("n_supp") >= 2 && col("n_late") === 1)
      val sup = s.table("supplier")
        .join(s.table("nation"),
          col("s_nationkey") === col("n_nationkey") && col("n_name") === "NATION_1")
        .select("s_suppkey", "s_name")
      candidates.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(100)
        .select("s_name", "numwait")
    },
    Some("""SELECT s_name, count(*) AS numwait
       FROM supplier, lineitem l1, orders, nation
       WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
         AND o_orderstatus = 'F'
         AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
         AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
       GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""))

  override def queries: Seq[GQ] = Seq(h01, h02, h03, h04, h05, h06, h07, h08,
    h09, h10, h11, h12, h13, h14, h15, h16, h17, h18, h19, h20, h21, h22)
}
