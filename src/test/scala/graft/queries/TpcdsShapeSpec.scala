package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Expand
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.{SparkEntry, SparkTestBase}

/** The TPC-DS-shaped gates' whole value is their PLAN class: every
  * multi-level aggregate (ROLLUP / CUBE / GROUPING SETS) must compile to
  * ONE Expand feeding one aggregate over one scan per input table — a
  * plan that re-scanned the fact table per grouping set would be
  * quadratic in levels at 100 TB. Pinned here so a refactor (or a SQL
  * rewrite in the oracle-side copy) can't silently regress it.
  */
class TpcdsShapeSpec extends SparkTestBase {

  private def shape(name: String): (Int, Int) = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    val lp = df.queryExecution.optimizedPlan
    val expands = lp.collect { case e: Expand => e }.size
    val scans = lp.collect { case r: LogicalRelation => r }.size
    (expands, scans)
  }

  test("each multi-level aggregate is ONE Expand over one scan per table") {
    val expected = Map(
      "q288_channel_sales_rollup" -> 3, // orders + lineitem + events
      "q289_hierarchy_rank" -> 2, // lineitem + part
      "q290_margin_lochierarchy" -> 3, // orders + customer + nation
      "q291_channel_grouping_sets" -> 2, // orders + lineitem
      "q292_status_cube" -> 1,
      "q293_lochierarchy_rank" -> 1)
    expected.foreach { case (name, nScans) =>
      val (expands, scans) = shape(name)
      assert(expands == 1, s"$name: expected 1 Expand, got $expands")
      assert(scans == nScans,
        s"$name: expected $nScans scans (one per input table), got $scans")
    }
  }

  test("grouping-set results are level-complete (rollup row counts)") {
    // q292 CUBE over (status, priority): observed (s,p) combos + |s| +
    // |p| + 1 grand total
    val cube = SparkEntry.queries("q292_status_cube")(spark, sf).collect()
    val o = graft.Tables.t(spark, sf, "orders")
    val nsp = o.select("o_orderstatus", "o_orderpriority").distinct().count()
    val ns = o.select("o_orderstatus").distinct().count()
    val np = o.select("o_orderpriority").distinct().count()
    assert(cube.length == nsp + ns + np + 1,
      s"cube must emit every level: got ${cube.length}")
    // grand-total row carries gid = 3 (both columns rolled up)
    assert(cube.count(_.get(4).toString == "3") == 1)
  }
}
