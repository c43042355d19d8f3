package graft.services

import graft.{SparkTestBase, Tables}

class QueryMetricsSpec extends SparkTestBase {

  test("listener captures duration, tables, and plan shape; feeds the optimizer") {
    val collector = QueryMetrics.install(spark)
    try {
      Tables.t(spark, sf, "orders").createOrReplaceTempView("orders")
      Tables.t(spark, sf, "customer").createOrReplaceTempView("customer")
      spark.sql("""SELECT c_mktsegment, sum(o_totalprice) FROM orders
                   JOIN customer ON o_custkey = c_custkey
                   WHERE o_totalprice > 100 GROUP BY c_mktsegment""").collect()
      // listener events are delivered async, and view-creation commands
      // also fire events — wait for the record that references our tables
      var tries = 0
      def interesting = collector.records.find(_.tables.contains("orders"))
      while (interesting.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val r = interesting.getOrElse(fail("no query event with tables arrived"))
      assert(r.tables.contains("orders") && r.tables.contains("customer"))
      assert(r.hasShuffle || r.hasBroadcast)
      assert(!r.failed)
      // monitor → recommend loop: usage extracted at event time
      val usage = collector.workloadUsage
        .map(u => (u.table, u.column) -> u).toMap
      assert(usage(("orders", "o_custkey")).nJoin >= 1)
      assert(usage(("orders", "o_totalprice")).nFilter >= 1)
      assert(usage(("customer", "c_mktsegment")).nGroup >= 1)
      val strat = graft.optimizer.WorkloadOptimizer.buildStrategyFromUsage(
        spark, collector.workloadUsage,
        Map("orders" -> (Tables.t(spark, sf, "orders"), None),
          "customer" -> (Tables.t(spark, sf, "customer"), None)),
        minDistinct = 50)
      assert(strat.nonEmpty)
    } finally spark.listenerManager.unregister(collector)
  }
}
