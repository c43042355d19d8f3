package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.HilbertKernel

/** Hilbert-curve layout semantics: the kernel's defining properties
  * (bijectivity, unit-step locality — which the z-curve provably lacks)
  * and the OPTIMIZE integration (content preserved, pruning ordering
  * hilbert ≤ z on the box workload). */
class HilbertSpec extends SparkTestBase {

  test("xy2d is a bijection onto [0, 2^16) over the full 256x256 grid") {
    val seen = new Array[Boolean](1 << 16)
    var x = 0L
    while (x < 256) {
      var y = 0L
      while (y < 256) {
        val d = HilbertKernel.xy2d(8, x, y)
        assert(d >= 0 && d < (1 << 16), s"($x,$y) -> $d out of range")
        assert(!seen(d.toInt), s"collision at d=$d")
        seen(d.toInt) = true
        y += 1
      }
      x += 1
    }
  }

  test("consecutive curve positions are exactly one Manhattan step apart") {
    // THE Hilbert property — the z-curve fails it at every quadrant
    // seam (e.g. z jumps (1,1)->(2,0), Manhattan 2). Walk the full
    // curve via the inverse map built from the bijectivity sweep.
    val cell = new Array[(Long, Long)](1 << 16)
    for (x <- 0L until 256L; y <- 0L until 256L)
      cell(HilbertKernel.xy2d(8, x, y).toInt) = (x, y)
    (1 until (1 << 16)).foreach { d =>
      val (x0, y0) = cell(d - 1)
      val (x1, y1) = cell(d)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"d=$d: (${x0},${y0}) -> (${x1},${y1}) is not a unit step")
    }
  }

  test("out-of-range bucket ids clamp instead of colliding or going negative") {
    assert(HilbertKernel.xy2d(8, -5, 0) == HilbertKernel.xy2d(8, 0, 0))
    assert(HilbertKernel.xy2d(8, 999, 255) == HilbertKernel.xy2d(8, 255, 255))
    assert(HilbertKernel.xyz2d(8, -5, 0, 3) == HilbertKernel.xyz2d(8, 0, 0, 3))
    assert(HilbertKernel.xyz2d(8, 999, 255, 7) == HilbertKernel.xyz2d(8, 255, 255, 7))
  }

  test("xyz2d is a bijection with unit-step locality over the full 3-D grid") {
    // 6 bits/dim = 262144 cells: big enough to cross every octant seam,
    // small enough to sweep exhaustively. Same two defining properties
    // as 2-D — every index hit exactly once, consecutive indices one
    // Manhattan step apart (Skilling's transform is a true Hilbert
    // curve; a Gray-code slip or interleave bug breaks one of these).
    val bits = 6
    val side = 1 << bits
    val cells = side * side * side
    val cell = new Array[Int](cells) // packed (x<<12 | y<<6 | z)
    val seen = new Array[Boolean](cells)
    for (x <- 0 until side; y <- 0 until side; z <- 0 until side) {
      val d = HilbertKernel.xyz2d(bits, x, y, z)
      assert(d >= 0 && d < cells, s"($x,$y,$z) -> $d out of range")
      assert(!seen(d.toInt), s"collision at d=$d")
      seen(d.toInt) = true
      cell(d.toInt) = (x << (2 * bits)) | (y << bits) | z
    }
    val mask = side - 1
    (1 until cells).foreach { d =>
      val (p, q) = (cell(d - 1), cell(d))
      val manhattan =
        math.abs((p >> (2 * bits)) - (q >> (2 * bits))) +
          math.abs(((p >> bits) & mask) - ((q >> bits) & mask)) +
          math.abs((p & mask) - (q & mask))
      assert(manhattan == 1, s"d=$d: cells $p -> $q not a unit step")
    }
  }

  test("3-D OPTIMIZE HILBERT preserves content and prunes a 3-D box") {
    val li = graft.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val t = GraftTable.createFrom(spark, scratch("hopt3"), li)
    // 2 KB files: a (1/4)^3-volume box over only 4 files (8 KB at this
    // SF) touches them all and the pruning assertion is vacuous
    t.setProperties(Map("graft.targetFileSize" -> (2 * 1024L).toString))
    Maintenance.optimize(t,
      zorderBy = Seq("l_orderkey", "l_partkey", "l_suppkey"),
      curve = "hilbert")
    assert(t.commits.last.operationParameters("curve") == "hilbert")
    val allCols = li.columns.map(col).toSeq
    assert(t.read().orderBy(allCols: _*).collect().toSeq
      == li.orderBy(allCols: _*).collect().toSeq)
    val r = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).head()
    def hi(lo: Long, hiV: Long) = lo + (hiV - lo) / 4
    val box =
      s"l_orderkey BETWEEN ${r.getLong(0)} AND ${hi(r.getLong(0), r.getLong(1))} AND " +
        s"l_partkey BETWEEN ${r.getLong(2)} AND ${hi(r.getLong(2), r.getLong(3))} AND " +
        s"l_suppkey BETWEEN ${r.getLong(4)} AND ${hi(r.getLong(4), r.getLong(5))}"
    val (kept, total) = t.pruneFiles(box)
    assert(total > 1 && kept.size < total, s"3-D box must prune: ${kept.size}/$total")
  }

  test("graft.clusterCurve property drives a bare OPTIMIZE; explicit arg wins") {
    val li = graft.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val t = GraftTable.createFrom(spark, scratch("hprop"), li)
    t.setProperties(Map(
      "graft.clusterBy" -> "l_orderkey,l_partkey",
      "graft.clusterCurve" -> "hilbert",
      "graft.targetFileSize" -> (8 * 1024L).toString))
    Maintenance.optimize(t) // bare: columns AND curve come from the table
    assert(t.commits.last.operationParameters("curve") == "hilbert")
    assert(t.commits.last.operationParameters("zOrderBy")
      == "l_orderkey,l_partkey")
  }

  test("hilbert_index arity mismatch raises an AnalysisException, not an internal error") {
    graft.functions.HilbertIndex.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT hilbert_index(1L)").collect())
    // the same WRONG_NUM_ARGS condition (sqlState 42605) Spark raises
    // for arity mismatches on built-in functions (review finding)
    assert(e.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", e.getCondition)
    val e4 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT hilbert_index(1L, 2L, 3L, 4L)").collect())
    assert(e4.getMessage.contains("hilbert_index"))
  }

  test("OPTIMIZE with the Hilbert curve preserves content exactly") {
    val li = graft.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    val t = GraftTable.createFrom(spark, scratch("hopt"), li)
    t.setProperties(Map("graft.targetFileSize" -> (8 * 1024L).toString))
    Maintenance.optimize(t, zorderBy = Seq("l_orderkey", "l_partkey"),
      curve = "hilbert")
    // (l_orderkey, l_linenumber) is NOT unique in the driver testdata —
    // sort on every column or tie order makes the compare flaky
    val allCols = li.columns.map(col).toSeq
    val got = t.read().orderBy(allCols: _*).collect().toSeq
    val want = li.orderBy(allCols: _*).collect().toSeq
    assert(got == want)
    assert(t.commits.last.operationParameters("curve") == "hilbert")
    // the layout actually prunes: a box over both dims reads < total
    val r = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).head()
    val box = s"l_orderkey >= ${r.getLong(0)} AND l_orderkey <= ${(r.getLong(0) + r.getLong(1)) / 4} AND " +
      s"l_partkey >= ${r.getLong(2)} AND l_partkey <= ${(r.getLong(2) + r.getLong(3)) / 4}"
    val (kept, total) = t.pruneFiles(box)
    assert(total > 1 && kept.size < total, s"box must prune: ${kept.size}/$total")
  }
}
