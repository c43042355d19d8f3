package graft.optimizer

import graft.{SparkTestBase, Tables}
import graft.optimizer.WorkloadOptimizer.QueryRecord

class WorkloadOptimizerSpec extends SparkTestBase {

  test("profileQueries attributes join/filter/group columns exactly") {
    Tables.t(spark, sf, "orders").createOrReplaceTempView("orders")
    Tables.t(spark, sf, "customer").createOrReplaceTempView("customer")
    val usage = WorkloadOptimizer.profileQueries(spark, Seq(
      QueryRecord(
        """SELECT c_mktsegment, count(*) FROM orders
           JOIN customer ON o_custkey = c_custkey
           WHERE o_totalprice > 1000 GROUP BY c_mktsegment""", 100)),
      Set("orders", "customer"))
    val m = usage.map(u => (u.table, u.column) -> u).toMap
    assert(m(("orders", "o_custkey")).nJoin === 1)
    assert(m(("customer", "c_custkey")).nJoin === 1)
    assert(m(("orders", "o_totalprice")).nFilter === 1)
    assert(m(("customer", "c_mktsegment")).nGroup === 1)
    // columns not used in join/filter/group don't appear
    assert(!m.contains(("orders", "o_orderdate")))
  }

  test("buildStrategy picks high-cardinality used columns, skips low-cardinality") {
    val tables = Map(
      "orders" -> (Tables.t(spark, sf, "orders"), None),
      "customer" -> (Tables.t(spark, sf, "customer"), None),
      "lineitem" -> (Tables.t(spark, sf, "lineitem"), None))
    val strat = WorkloadOptimizer.buildStrategy(spark,
      graft.queries.OptimizerQueries.workload(sf), tables, minDistinct = 50)
    val byTable = strat.map(s => s.table -> s).toMap
    // orders: o_orderkey (unique key, join + point filter) outranks
    // lower-cardinality columns — the scoring equation is cardinality-
    // weighted; o_orderpriority (5 distinct) must be excluded by the floor
    assert(byTable.contains("orders"))
    assert(byTable("orders").zorderCols.contains("o_orderkey"))
    assert(!byTable("orders").zorderCols.contains("o_orderpriority"))
    assert(byTable("orders").optimizeCommand.startsWith("OPTIMIZE orders ZORDER BY"))
    // lineitem: l_orderkey join column qualifies
    assert(byTable.get("lineitem").forall(_.zorderCols.nonEmpty))
  }

  test("write-predicate mining flags merge/delete predicate columns") {
    val t = graft.tables.GraftTable.createFrom(spark, scratch("wp"),
      Tables.t(spark, sf, "part"))
    graft.tables.MergeOps.delete(t, "p_size < 5")
    val w = WorkloadOptimizer.writePredicateColumns(t,
      Tables.t(spark, sf, "part").columns.toSeq)
    assert(w === Set("p_size"))
  }

  test("apply-then-measure: emitted OPTIMIZE strictly improves file pruning") {
    // the q245 round trip with the file counts pinned explicitly:
    // fragmented unclustered table -> profile -> apply the EMITTED
    // command through the SQL router -> point lookup prunes strictly
    import graft.tables.GraftTable
    val path = scratch("optapplyspec")
    val o = Tables.t(spark, sf, "orders")
    val t = GraftTable.create(spark, path, o.schema)
    t.setProperties(Map("graft.targetFileSize" -> (32 * 1024).toString))
    t.append(o.repartition(16))
    val (keptBefore, totalBefore) = t.pruneFiles("o_orderkey = 42")
    assert(totalBefore === 16)
    assert(keptBefore.size >= totalBefore / 2,
      "unclustered fragments should mostly survive pruning")

    val strat = WorkloadOptimizer.buildStrategy(spark,
        graft.queries.OptimizerQueries.workload(sf),
        Map("orders" -> (t.read(), None)), minDistinct = 20,
        exactCardinality = true)
      .find(_.table == "orders").get
    assert(strat.zorderCols.nonEmpty &&
      strat.optimizeCommand.startsWith("OPTIMIZE orders ZORDER BY"))

    val g = new graft.sql.GraftSql(spark, path + "-sql")
    g.register("orders", t)
    g.sql(strat.optimizeCommand)
    val (keptAfter, totalAfter) = t.pruneFiles("o_orderkey = 42")
    assert(totalAfter > 1, "optimize should still write multiple files")
    assert(keptAfter.size < keptBefore.size,
      s"pruning must strictly improve: ${keptBefore.size}/$totalBefore -> " +
        s"${keptAfter.size}/$totalAfter")
    // content unchanged by the applied layout
    assert(t.read().count() === o.count())
  }
}
