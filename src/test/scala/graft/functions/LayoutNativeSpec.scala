package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Exact-equality pins for the native bucket-index expression against the
  * HOF form it replaced in Maintenance.bucketIds (reproduced verbatim):
  * `size(filter(array(<bound lits>), b => x >= b)).cast("long")`.
  * Random bounds/values plus the adversarial edges: null input, NaN input,
  * NaN bounds, ±0.0 on both sides, values equal to bounds, duplicate
  * bounds, empty bounds. */
class LayoutNativeSpec extends SparkTestBase {

  // the replaced HOF formulation, verbatim (post `.distinct.sorted`,
  // exactly as Maintenance built it)
  private def hofBucket(c: Column, bs: Array[Double]): Column = {
    val arr = array(bs.map(lit(_)): _*)
    size(filter(arr, b => c >= b)).cast("long")
  }

  private def assertSame(values: Seq[java.lang.Double], boundsRaw: Array[Double]): Unit = {
    val bs = boundsRaw.distinct.sorted // Maintenance's exact preprocessing
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(values.map(org.apache.spark.sql.Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
    val rows = df.select(
      graft.functions.LayoutNative.bucketIdx(col("x"), bs).as("native"),
      (if (bs.isEmpty) lit(0L) else hofBucket(col("x"), bs)).as("hof"),
      col("x")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1), s"x=${r.get(2)} bounds=${bs.toSeq}")
    }
  }

  test("random values and bounds match the HOF form") {
    val rng = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val bounds = Array.fill(rng.nextInt(300) + 1)(rng.nextDouble() * 100 - 50)
      val values = Seq.fill(200)(java.lang.Double.valueOf(rng.nextDouble() * 120 - 60)) ++
        bounds.take(5).map(java.lang.Double.valueOf) // exact-boundary hits
      assertSame(values, bounds)
    }
  }

  test("null, NaN, ±0.0, duplicate bounds, boundary equality") {
    val bounds = Array(-0.0, 0.0, 0.0, 1.5, 1.5, Double.NaN, -3.0,
      Double.NegativeInfinity, Double.PositiveInfinity)
    val values = Seq[java.lang.Double](null, Double.NaN, -0.0, 0.0, 1.5,
      -3.0, Double.NegativeInfinity, Double.PositiveInfinity, 2.0, -100.0)
    assertSame(values, bounds)
  }

  test("empty and single-bound arrays") {
    assertSame(Seq[java.lang.Double](null, 1.0, -1.0, Double.NaN), Array(0.0))
    // empty bounds: the HOF would be size(filter(array(), ..)) = 0 — the
    // native form must agree (assertSame substitutes lit(0) for the HOF
    // because array() of zero doubles needs a cast; the native path runs)
    assertSame(Seq[java.lang.Double](null, 5.0), Array.empty[Double])
  }

  test("interpreted eval matches codegen") {
    val bounds = Array(-1.0, 0.0, 2.5)
    Seq[java.lang.Double](null, Double.NaN, -0.0, 0.0, 2.5, 3.0, -2.0).foreach { v =>
      val e = BucketIdx(
        org.apache.spark.sql.catalyst.expressions.Literal(v, org.apache.spark.sql.types.DoubleType),
        bounds)
      val interp = e.eval(null)
      // Spark double semantics: NaN is greatest (counts every bound)
      val expected =
        if (v == null) 0L
        else if (v.isNaN) bounds.length.toLong
        else bounds.count(b => v.doubleValue() >= b).toLong
      assert(interp === expected, s"v=$v")
    }
  }
}
