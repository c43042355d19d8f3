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

  test("pinned bounds reproduce psi exactly and honor caller bounds") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val cur = (Seq(-500.0, 900.0) ++ (1 to 50).map(_.toDouble)).toDF("v")
    // the monitor shape: bounds derived once, reused per batch — must be
    // row-for-row identical to the self-deriving psi()
    val (mn, mx) = Drift.bounds(ref, "v")
    assert(mn == 1.0 && mx == 100.0)
    val viaPsi = Drift.psi(ref, cur, "v", bins = 4).orderBy("bin").collect().toSeq
    val viaPinned = Drift.psiWithBounds(ref, cur, "v", mn, mx, bins = 4)
      .orderBy("bin").collect().toSeq
    assert(viaPinned == viaPsi)
    // caller-supplied bounds are authoritative: a narrower window clamps
    // BOTH sides into its edge bins
    val narrow = Drift.psiWithBounds(ref, cur, "v", 40.0, 60.0, bins = 2)
      .orderBy("bin")
      .select("bin", "ref_n", "cur_n").as[(Int, Long, Long)].collect().toSeq
    // width 10: bin0 = [.., 50), bin1 = [50, ..). ref: 1..49 | 50..100;
    // cur: -500 clamps to bin0 with 1..49, 50 and 900 land in bin1
    assert(narrow == Seq((0, 49L, 50L), (1, 51L, 2L)))
  }

  test("categorical: new categories land in __other__ and alarm") {
    val ref = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
      .toDF("k")
    val cur = (Seq.fill(50)("a") ++ Seq.fill(50)("NEW")).toDF("k")
    val got = Drift.psiCategorical(ref, cur, "k", topK = 2)
      .orderBy("bucket")
      .select("bucket", "ref_n", "cur_n")
      .as[(String, Long, Long)].collect().toSeq
    // ref top-2 = a(50), b(30); c(20) -> other; cur's NEW -> other
    assert(got == Seq(("__other__", 20L, 50L), ("a", 50L, 50L), ("b", 30L, 0L)))
    val total = Drift.psiCategorical(ref, cur, "k", topK = 2)
      .agg(sum("psi_term")).head().getDouble(0)
    assert(total > 0.25, s"a vanished and an invented category must alarm, got $total")
  }

  test("categorical: identical distributions score ~0; top-K ties break category-asc") {
    val d = (Seq.fill(10)("x") ++ Seq.fill(10)("y") ++ Seq.fill(10)("z")).toDF("k")
    val rows = Drift.psiCategorical(d, d, "k", topK = 2)
      .orderBy("bucket").collect()
    // tie at 10/10/10: top-2 = x, y (category asc); z -> other
    assert(rows.map(_.getString(0)).toSeq == Seq("__other__", "x", "y"))
    rows.foreach(r => assert(math.abs(r.getAs[Double]("psi_term")) < 1e-6))
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
