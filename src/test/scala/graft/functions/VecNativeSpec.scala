package graft.functions

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Bit-equality pins for the native vector kernels against the exact
  * higher-order-function formulations they replaced (the pre-r18 code,
  * reproduced verbatim below). Random data plus the adversarial edges:
  * distance ties, -0.0 vs 0.0 similarity ties, zero-norm vectors and
  * centroids, NaN elements, null elements, shuffled cell order. Doubles
  * compare by raw bits — sign of zero included. */
class VecNativeSpec extends SparkTestBase {
  import graft.vector.VectorOps

  private val rng = new scala.util.Random(42)
  private def vec(d: Int): Seq[Double] = Seq.fill(d)(rng.nextDouble() * 2 - 1)

  private def bits(x: Any): Any = x match {
    case d: Double => java.lang.Double.doubleToRawLongBits(d)
    case s: Seq[_] => s.map(bits)
    case other => other
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame, a: Column, b: Column): Unit = {
    val rows = df.select(a.as("x"), b.as("y")).collect()
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(bits(r.get(0)) === bits(r.get(1)), s"row $i: ${r.get(0)} vs ${r.get(1)}")
    }
  }

  // ---- the replaced HOF formulations, verbatim --------------------------

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def hofNorm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  private def hofL2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  private def hofCentLit(cents: Seq[(Int, Int, Seq[Double])]): Column =
    array(cents.map(cb =>
      struct(lit(cb._1).as("sub"), lit(cb._2).as("cell"),
        array(cb._3.map(lit): _*).as("c"))): _*)

  private def hofNearestCell(cents: Column, sub: Column, sv: Column): Column =
    array_min(transform(filter(cents, cb => cb.getField("sub") === sub),
      cb => struct(hofL2sq(sv, cb.getField("c")).as("d"),
        cb.getField("cell").as("cell")))).getField("cell")

  private def hofCodes(cents: Seq[(Int, Int, Seq[Double])], m: Int, v: Column): Column = {
    val dsub = cents.head._3.size
    val cl = hofCentLit(cents)
    transform(sequence(lit(0), lit(m - 1)), s =>
      hofNearestCell(cl, s, slice(v, s * dsub + 1, lit(dsub))))
  }

  private def hofIvfAssign(cents: Seq[(Int, Seq[Double])], v: Column, nv: Column): Column = {
    val centArr = array(cents.map { case (cell, c) =>
      val n = math.sqrt(c.map(x => x * x).sum)
      struct(lit(cell).as("cell"), array(c.map(lit): _*).as("c"), lit(n).as("n"))
    }: _*)
    array_min(transform(centArr, s => {
      val denom = nv * s.getField("n")
      struct(when(denom > 0, negate(hofDot(v, s.getField("c")) / denom))
          .otherwise(lit(0.0)).as("negSim"),
        s.getField("cell").as("cell"))
    })).getField("cell")
  }

  private def hofProbeCells(cents: Seq[(Int, Seq[Double])], v: Column, vn: Column,
      n: Int): Column = {
    val centArr = array(cents.map { case (cell, c) =>
      struct(lit(cell).as("cell"), array(c.map(lit): _*).as("c"),
        lit(math.sqrt(c.map(x => x * x).sum)).as("n"))
    }: _*)
    slice(transform(array_sort(
      transform(centArr, s => {
        val denom = vn * s.getField("n")
        struct(when(denom > 0, negate(hofDot(v, s.getField("c")) / denom))
            .otherwise(lit(1.0)).as("negSim"),
          s.getField("cell").as("cell"))
      })), e => e.getField("cell")), 1, n)
  }

  private def hofAdcLookup(tbl: Column, codes: Column, m: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
      acc + element_at(element_at(tbl, s + 1), element_at(codes, s + 1) + 1))

  // ---- fixtures ---------------------------------------------------------

  private val d = 16
  private lazy val doubleDf = {
    val rows = Seq.fill(40)(vec(d)) ++ Seq(
      Seq.fill(d)(0.0), // zero norm
      (1.0 +: Seq.fill(d - 1)(0.0)), // e1
      (0.0 +: 1.0 +: Seq.fill(d - 2)(0.0)), // e2 (orthogonal probes)
      (Double.NaN +: Seq.fill(d - 1)(1.0)) // NaN element
    )
    val schema = StructType(Seq(StructField("v", ArrayType(DoubleType, false))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_)), 2), schema)
  }

  private lazy val floatDf = {
    val rows = Seq.fill(20)(vec(d).map(x => x.toFloat: java.lang.Float)) ++ Seq(
      Seq.fill[java.lang.Float](d)(0.0f),
      (null: java.lang.Float) +: Seq.fill[java.lang.Float](d - 1)(1.0f) // null elem
    )
    val schema = StructType(Seq(StructField("f", ArrayType(FloatType, true))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_)), 2), schema)
  }

  test("DotProd/NormL2 == HOF on double arrays (zero, NaN rows included)") {
    val q = vec(d)
    val qN = VecLit.doubles(q)
    val qH = array(q.map(lit): _*)
    assertSame(doubleDf, VectorOps.dot(col("v"), qN), hofDot(col("v"), qH))
    assertSame(doubleDf, VectorOps.norm(col("v")), hofNorm(col("v")))
  }

  test("DotProd/NormL2 == HOF on float arrays incl. null element") {
    val q = vec(d)
    val qN = VecLit.doubles(q)
    val qH = array(q.map(lit): _*)
    assertSame(floatDf, VectorOps.dot(col("f"), qN), hofDot(col("f"), qH))
    assertSame(floatDf, VectorOps.norm(col("f")), hofNorm(col("f")))
  }

  test("PqEncode == HOF codes (ties via duplicate centroids, NaN rows)") {
    val m = 4
    val dsub = d / m
    // duplicate centroid content across two cells of sub 1 → distance tie;
    // drop cell 1 of sub 2 entirely (dropped-empty-cell shape)
    val base = for (s <- 0 until m; c <- 0 until 3) yield (s, c, vec(dsub))
    val cents = base.map {
      case (1, 2, _) => (1, 2, base.find(x => x._1 == 1 && x._2 == 0).get._3)
      case other => other
    }.filterNot(x => x._1 == 2 && x._2 == 1)
    val centsLit = VecLit.of(cents.map(c => Row(c._1, c._2, c._3)),
      PqCodebookData.schema)
    val native = org.apache.spark.sql.graftbridge.ExprColumn.column(
      PqEncode(
        org.apache.spark.sql.graftbridge.ExprColumn.expression(col("v")),
        org.apache.spark.sql.graftbridge.ExprColumn.expression(centsLit)))
    assertSame(doubleDf, native, hofCodes(cents, m, col("v")))
  }

  test("IvfAssign == HOF argmin (orthogonal -0.0 vs zero-centroid 0.0 tie)") {
    // cell 7: e1 (orthogonal to e2 row → negSim = -0.0, denom > 0)
    // cell 3: all-zero centroid (denom = 0 → negSim = 0.0 sentinel)
    // shuffled order + duplicate content across cells to force cell ties
    val e1 = 1.0 +: Seq.fill(d - 1)(0.0)
    val c0 = vec(d)
    val cents = Seq((7, e1), (3, Seq.fill(d)(0.0)), (5, c0), (2, c0), (9, vec(d)))
    val nv = VectorOps.norm(col("v"))
    val rows = cents.map { case (cell, c) =>
      Row(cell, c, math.sqrt(c.map(x => x * x).sum)) }
    val native = org.apache.spark.sql.graftbridge.ExprColumn.column(
      IvfAssign(
        org.apache.spark.sql.graftbridge.ExprColumn.expression(col("v")),
        org.apache.spark.sql.graftbridge.ExprColumn.expression(
          VecLit.of(rows, IvfCentsData.schema))))
    assertSame(doubleDf, native, hofIvfAssign(cents, col("v"), nv))
  }

  test("IvfProbeCells == HOF sorted probe list") {
    val e1 = 1.0 +: Seq.fill(d - 1)(0.0)
    val c0 = vec(d)
    val cents = Seq((7, e1), (3, Seq.fill(d)(0.0)), (5, c0), (2, c0), (9, vec(d)))
    val nv = VectorOps.norm(col("v"))
    val rows = cents.map { case (cell, c) =>
      Row(cell, c, math.sqrt(c.map(x => x * x).sum)) }
    for (n <- Seq(1, 3, 5)) {
      val native = org.apache.spark.sql.graftbridge.ExprColumn.column(
        IvfProbeCells(
          org.apache.spark.sql.graftbridge.ExprColumn.expression(col("v")),
          org.apache.spark.sql.graftbridge.ExprColumn.expression(nv),
          org.apache.spark.sql.graftbridge.ExprColumn.expression(
            VecLit.of(rows, IvfCentsData.schema)),
          n))
      assertSame(doubleDf, native, hofProbeCells(cents, col("v"), nv, n))
    }
  }

  test("AdcLookup == HOF lookup (foldable table and per-row table)") {
    val m = 4
    val ksub = 3
    val tbl = Seq.tabulate(m, ksub)((s, c) => rng.nextDouble() + s + c)
    val codesDf = {
      val rows = Seq.fill(30)(Seq.fill(m)(rng.nextInt(ksub)))
      val schema = StructType(Seq(StructField("codes", ArrayType(IntegerType, false))))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Row(_)), 2), schema)
    }
    val tblN = VecLit.doubles2(tbl.map(_.toSeq))
    val tblH = array(tbl.map(r => array(r.map(lit): _*)): _*)
    val native = org.apache.spark.sql.graftbridge.ExprColumn.column(
      AdcLookup(
        org.apache.spark.sql.graftbridge.ExprColumn.expression(col("codes")),
        org.apache.spark.sql.graftbridge.ExprColumn.expression(tblN)))
    assertSame(codesDf, native, hofAdcLookup(tblH, col("codes"), m))

    // per-row (non-foldable) table: ride it through a map extract like
    // adcRankPairs does
    val qmap = VecLit.of(Map(0L -> Row(tbl.map(_.toSeq))),
      MapType(LongType, StructType(Seq(StructField("dots",
        ArrayType(ArrayType(DoubleType, false), false), false))), false))
    val perRow = element_at(qmap, lit(0L)).getField("dots")
    val native2 = org.apache.spark.sql.graftbridge.ExprColumn.column(
      AdcLookup(
        org.apache.spark.sql.graftbridge.ExprColumn.expression(col("codes")),
        org.apache.spark.sql.graftbridge.ExprColumn.expression(perRow)))
    assertSame(codesDf, native2, hofAdcLookup(tblH, col("codes"), m))
  }

  test("interpreted eval path (used by constant folding) matches HOF") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val xs = vec(d)
    val q = vec(d)
    val at = ArrayType(DoubleType, containsNull = false)
    val evalDot = DotProd(Literal.create(xs, at), Literal.create(q, at))
      .eval(null).asInstanceOf[Double]
    val evalNorm = NormL2(Literal.create(xs, at)).eval(null).asInstanceOf[Double]
    val r = spark.range(1).select(
      hofDot(VecLit.doubles(xs), VecLit.doubles(q)).as("d"),
      hofNorm(VecLit.doubles(xs)).as("n")).head
    assert(bits(evalDot) === bits(r.getDouble(0)))
    assert(bits(evalNorm) === bits(r.getDouble(1)))
  }
}
