package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** TPC-DS-shaped plan classes (round 18, VERDICT r17 #4): the bench
  * corpus was TPC-H-dialect only, while the reference's benchmark is
  * TPC-DS 2.4 (`30-performance/TPC-DS Runner/notebooks/
  * create_data_and_queries.scala:83-101`). These gates add the plan
  * shapes TPC-H lacks — channel-union + multi-level aggregates
  * (ROLLUP / CUBE / GROUPING SETS / lochierarchy ranking, the
  * q5/q67/q36/q77/q86-like classes) — over the existing testdata
  * schema, each with a full DuckDB oracle.
  *
  * Scale shape, shared by all six: Spark compiles every multi-level
  * aggregate here to ONE Expand + ONE hash aggregate over ONE scan per
  * input table — the grouping levels replicate rows map-side, they do
  * NOT re-scan the table per grouping set (pinned in TpcdsShapeSpec).
  * That is exactly the 100 TB-safe plan: level count multiplies the
  * shuffle rows (bounded by the level keys' cardinality after partial
  * aggregation), never the IO.
  *
  * Float discipline: ranked ORDER BY keys use sums of integers-as-
  * doubles (exact in fp regardless of addition order), so ranks can't
  * flake across engines; displayed double sums take the
  * `round(x + 1e-9, 2)` idiom like every other gate.
  */
object TpcdsQueries extends QueryBatch {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  /** TPC-DS q5 shape: per-channel sales/returns UNION ALL, one ROLLUP
    * (channel, id) over the union — subtotals per channel and the grand
    * total in the same pass. */
  private val q288 = GQ(
    "q288_channel_sales_rollup",
    (s, dir) => {
      val store = t(s, dir, "orders").select(
        lit("store").as("channel"), col("o_orderpriority").as("id"),
        col("o_totalprice").as("sales"), lit(0.0).as("returns"))
      val catalog = t(s, dir, "lineitem").select(
        lit("catalog").as("channel"), col("l_linestatus").as("id"),
        when(col("l_returnflag") =!= "R",
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .otherwise(0.0).as("sales"),
        when(col("l_returnflag") === "R", col("l_extendedprice"))
          .otherwise(0.0).as("returns"))
      val web = t(s, dir, "events").select(
        lit("web").as("channel"), col("event_type").as("id"),
        when(col("value") > 0, col("value")).otherwise(0.0).as("sales"),
        when(col("value") < 0, -col("value")).otherwise(0.0).as("returns"))
      store.unionByName(catalog).unionByName(web)
        .rollup("channel", "id")
        .agg(round(sum("sales") + lit(1e-9), 2).as("sales"),
          round(sum("returns") + lit(1e-9), 2).as("returns"),
          count(lit(1)).as("n"))
        .orderBy("channel", "id")
    },
    Some("""WITH u AS (
              SELECT 'store' AS channel, o_orderpriority AS id,
                     o_totalprice AS sales, 0.0 AS returns FROM orders
              UNION ALL
              SELECT 'catalog', l_linestatus,
                     CASE WHEN l_returnflag <> 'R'
                          THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END,
                     CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END
              FROM lineitem
              UNION ALL
              SELECT 'web', event_type,
                     CASE WHEN value > 0 THEN value ELSE 0.0 END,
                     CASE WHEN value < 0 THEN -value ELSE 0.0 END
              FROM events)
            SELECT channel, id,
                   round(sum(sales) + 1e-9, 2) AS sales,
                   round(sum(returns) + 1e-9, 2) AS returns,
                   count(*) AS n
            FROM u GROUP BY ROLLUP (channel, id)
            ORDER BY channel, id""")
  )

  /** TPC-DS q67 shape: a dimension join feeding a product-hierarchy
    * ROLLUP, then rank() per top-level group over the rolled-up rows,
    * top-k kept. The rank key sums integer quantities (exact fp). */
  private val q289 = GQ(
    "q289_hierarchy_rank",
    (s, dir) => {
      // SQL form on purpose: detached col() references after a
      // rollup-over-join trip Spark's ambiguous-self-join heuristic
      // (the rollup re-aliases its grouping attributes); the SQL
      // analyzer resolves the identical one-Expand plan cleanly
      Tables.registerAll(s, dir)
      s.sql("""SELECT p_type, p_brand, round(sum_qty + 1e-9, 2) AS sum_qty, n, rk
               FROM (
                 SELECT p_type, p_brand, sum_qty, n,
                        rank() OVER (PARTITION BY p_type
                                     ORDER BY sum_qty DESC,
                                              coalesce(p_brand, '') ASC) AS rk
                 FROM (
                   SELECT p_type, p_brand,
                          sum(l_quantity) AS sum_qty, count(*) AS n
                   FROM lineitem JOIN part ON l_partkey = p_partkey
                   GROUP BY ROLLUP (p_type, p_brand)))
               WHERE rk <= 3
               ORDER BY p_type, rk, p_brand""")
    },
    Some("""SELECT p_type, p_brand, round(sum_qty + 1e-9, 2) AS sum_qty, n, rk
            FROM (
              SELECT p_type, p_brand, sum_qty, n,
                     rank() OVER (PARTITION BY p_type
                                  ORDER BY sum_qty DESC,
                                           coalesce(p_brand, '') ASC) AS rk
              FROM (
                SELECT p_type, p_brand,
                       sum(l_quantity) AS sum_qty, count(*) AS n
                FROM lineitem JOIN part ON l_partkey = p_partkey
                GROUP BY ROLLUP (p_type, p_brand)))
            WHERE rk <= 3
            ORDER BY p_type, rk, p_brand""")
  )

  /** TPC-DS q36 shape: two dimension joins feeding a geography/segment
    * ROLLUP with a lochierarchy column (grouping(a)+grouping(b)) and a
    * ratio measure per level. */
  private val q290 = GQ(
    "q290_margin_lochierarchy",
    (s, dir) => {
      // SQL form for the same reason as q289 (rollup-over-join + the
      // self-join ambiguity heuristic)
      Tables.registerAll(s, dir)
      s.sql("""SELECT n_name, c_mktsegment, count(*) AS n_orders,
                      round(sum(o_totalprice) + 1e-9, 2) AS revenue,
                      round(avg(o_totalprice) + 1e-9, 2) AS avg_price,
                      CAST(GROUPING(n_name) + GROUPING(c_mktsegment) AS INTEGER)
                        AS lochierarchy
               FROM orders
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               GROUP BY ROLLUP (n_name, c_mktsegment)
               ORDER BY lochierarchy DESC, n_name, c_mktsegment""")
    },
    Some("""SELECT n_name, c_mktsegment, count(*) AS n_orders,
                   round(sum(o_totalprice) + 1e-9, 2) AS revenue,
                   round(avg(o_totalprice) + 1e-9, 2) AS avg_price,
                   CAST(GROUPING(n_name) + GROUPING(c_mktsegment) AS INTEGER)
                     AS lochierarchy
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY ROLLUP (n_name, c_mktsegment)
            ORDER BY lochierarchy DESC, n_name, c_mktsegment""")
  )

  /** TPC-DS q77 shape: a two-channel union aggregated by GROUPING SETS
    * that is NOT a rollup — ((channel,id),(id),()) skips the per-channel
    * level and adds a cross-channel per-id level. */
  private val q291 = GQ(
    "q291_channel_grouping_sets",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT channel, id, count(*) AS n,
               round(sum(amount) + 1e-9, 2) AS amount
               FROM (
                 SELECT 'store' AS channel, o_orderstatus AS id,
                        o_totalprice AS amount FROM orders
                 UNION ALL
                 SELECT 'catalog', l_linestatus, l_extendedprice FROM lineitem)
               GROUP BY GROUPING SETS ((channel, id), (id), ())
               ORDER BY channel, id, n""")
    },
    Some("""SELECT channel, id, count(*) AS n,
            round(sum(amount) + 1e-9, 2) AS amount
            FROM (
              SELECT 'store' AS channel, o_orderstatus AS id,
                     o_totalprice AS amount FROM orders
              UNION ALL
              SELECT 'catalog', l_linestatus, l_extendedprice FROM lineitem)
            GROUP BY GROUPING SETS ((channel, id), (id), ())
            ORDER BY channel, id, n""")
  )

  /** CUBE over (status, priority): all four grouping levels in one
    * pass — the full cross-classification TPC-DS reaches via CUBE. */
  private val q292 = GQ(
    "q292_status_cube",
    (s, dir) => t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice") + lit(1e-9), 2).as("revenue"),
        grouping_id().as("gid"))
      .orderBy("gid", "o_orderstatus", "o_orderpriority"),
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
            round(sum(o_totalprice) + 1e-9, 2) AS revenue,
            GROUPING(o_orderstatus, o_orderpriority) AS gid
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
            ORDER BY gid, o_orderstatus, o_orderpriority""")
  )

  /** TPC-DS q86 shape: ROLLUP + lochierarchy + rank PARTITIONED BY the
    * hierarchy level (and the parent key within level 0), ordered by an
    * exact integer-sum measure. */
  private val q293 = GQ(
    "q293_lochierarchy_rank",
    (s, dir) => {
      val rolled = t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"),
          (grouping(col("l_returnflag")) + grouping(col("l_linestatus")))
            .cast("int").as("lochierarchy"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lochierarchy"),
          when(col("lochierarchy") === 0, col("l_returnflag")))
        .orderBy(col("sum_qty").desc,
          coalesce(col("l_linestatus"), lit("")).asc)
      rolled.withColumn("rank_within_parent", rank().over(w))
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("sum_qty") + lit(1e-9), 2).as("sum_qty"),
          col("lochierarchy"), col("rank_within_parent"))
        .orderBy(col("lochierarchy").desc, col("l_returnflag"),
          col("rank_within_parent"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
                   round(sum_qty + 1e-9, 2) AS sum_qty,
                   lochierarchy, rank_within_parent
            FROM (
              SELECT l_returnflag, l_linestatus, sum_qty, lochierarchy,
                     rank() OVER (
                       PARTITION BY lochierarchy,
                         CASE WHEN lochierarchy = 0 THEN l_returnflag END
                       ORDER BY sum_qty DESC,
                                coalesce(l_linestatus, '') ASC)
                       AS rank_within_parent
              FROM (
                SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
                       CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus)
                            AS INTEGER) AS lochierarchy
                FROM lineitem
                GROUP BY ROLLUP (l_returnflag, l_linestatus)))
            ORDER BY lochierarchy DESC, l_returnflag, rank_within_parent""")
  )

  override def queries: Seq[GQ] = Seq(q288, q289, q290, q291, q292, q293)
}
