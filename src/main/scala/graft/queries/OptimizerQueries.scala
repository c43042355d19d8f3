package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.optimizer.WorkloadOptimizer
import graft.optimizer.WorkloadOptimizer.QueryRecord

/** Workload auto-tuner coverage: profile a fixed query history, emit the
  * ranked ZORDER/ANALYZE strategy (`OPT:1714-1967`).
  */
object OptimizerQueries extends QueryBatch {

  /** A representative workload over the star schema. */
  def workload(dir: String): Seq[QueryRecord] = Seq(
    QueryRecord(
      """SELECT o_orderpriority, count(*) FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01' GROUP BY o_orderpriority""", 4000),
    QueryRecord(
      """SELECT c_mktsegment, sum(o_totalprice) FROM orders
         JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment""", 9000),
    QueryRecord(
      """SELECT * FROM orders WHERE o_orderkey = 42""", 1000),
    QueryRecord(
      """SELECT o_custkey, count(*) FROM orders
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE l_shipdate < TIMESTAMP '1997-01-01' GROUP BY o_custkey""", 15000))

  /** Strategy output: which columns the tuner would ZORDER each table by.
    * Rows-only check (the scoring pipeline is asserted property-wise in
    * WorkloadOptimizerSpec; no SQL-expressible oracle since profiling
    * walks Catalyst plans). */
  private val q120 = GQ(
    "q120_workload_optimizer",
    (s, dir) => {
      import s.implicits._
      val tables = Map(
        "orders" -> (Tables.t(s, dir, "orders"), None),
        "customer" -> (Tables.t(s, dir, "customer"), None),
        "lineitem" -> (Tables.t(s, dir, "lineitem"), None))
      WorkloadOptimizer.buildStrategy(s, workload(dir), tables, minDistinct = 50)
        .map(st => (st.table, st.zorderCols.mkString(","), st.optimizeCommand))
        .toDF("table", "zorder_cols", "optimize_command")
        .orderBy("table")
    },
    None
  )

  /** Stats-based file skipping correctness: a point lookup through
    * `readWhere` on a ZORDERed table returns exactly the unpruned filter
    * result (pruning ratio is asserted in FileStatsSpec; `DP/Step 2`
    * behavior). */
  private val q121 = GQ(
    "q121_stats_skipping",
    (s, dir) => {
      import java.nio.file.{Files, Paths}
      import graft.tables.{GraftTable, Maintenance}
      val p = Paths.get("/root/repo/target/qtmp",
        "skip-" + java.util.UUID.randomUUID().toString.take(8))
      Files.createDirectories(p.getParent)
      val li = Tables.t(s, dir, "lineitem")
      val t = GraftTable.createFrom(s, p.toString, li)
      t.setProperties(Map("graft.targetFileSize" -> (256 * 1024).toString))
      Maintenance.optimize(t, zorderBy = Seq("l_orderkey"))
      t.readWhere("l_orderkey <= 100")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_orderkey <= 100 ORDER BY l_orderkey, l_linenumber""")
  )

  override def queries: Seq[GQ] = Seq(q120, q121)
}
