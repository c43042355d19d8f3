package graft.services

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** PSI drift semantics on hand-computed histograms: identical
  * distributions score ~0, a hard shift scores high, out-of-range
  * clamping, zero-bin smoothing, and null exclusion. */
class DriftSpec extends SparkTestBase {
  import spark.implicits._

  test("identical distributions: every psi_term is ~0 and shares match") {
    val d = (1 to 100).map(_.toDouble).toDF("v")
    val got = Drift.psi(d, d, "v", bins = 4).orderBy("bin")
      .select("ref_n", "cur_n", "psi_term")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == got.map(_._2))
    got.foreach { case (_, _, t) => assert(math.abs(t) < 1e-6) }
  }

  test("a hard distribution shift produces a large total PSI") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val cur = (1 to 100).map(_ => 95.0).toDF("v") // everything in the top bin
    val total = Drift.psi(ref, cur, "v", bins = 4)
      .agg(sum("psi_term")).head().getDouble(0)
    assert(total > 1.0, s"hard shift must alarm, got $total")
  }

  test("current values outside the reference range clamp into edge bins") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val cur = Seq(-500.0, 900.0).toDF("v")
    val got = Drift.psi(ref, cur, "v", bins = 4).orderBy("bin")
      .select("bin", "cur_n").as[(Int, Long)].collect().toSeq
    assert(got == Seq((0, 1L), (1, 0L), (2, 0L), (3, 1L)))
  }

  test("empty bins are smoothed, never NaN/Inf; nulls are excluded") {
    val ref = Seq(Some(1.0), Some(10.0), None).toDF("v")
    val cur = Seq(Option.empty[Double], Some(1.0)).toDF("v")
    val got = Drift.psi(ref, cur, "v", bins = 3).collect()
    got.foreach { r =>
      val t = r.getAs[Double]("psi_term")
      assert(!t.isNaN && !t.isInfinite)
    }
    // ref had 2 non-null values; cur 1
    assert(got.map(_.getAs[Long]("ref_n")).sum == 2)
    assert(got.map(_.getAs[Long]("cur_n")).sum == 1)
  }

  test("constant reference column (zero width) still bins sanely") {
    val ref = Seq(5.0, 5.0, 5.0).toDF("v")
    val cur = Seq(5.0, 6.0).toDF("v")
    val got = Drift.psi(ref, cur, "v", bins = 2).orderBy("bin")
      .select("bin", "ref_n", "cur_n").as[(Int, Long, Long)].collect().toSeq
    // width falls back to 1: ref all in bin 0; cur: 5.0->0, 6.0->clamped 1
    assert(got == Seq((0, 3L, 1L), (1, 0L, 1L)))
  }
}
