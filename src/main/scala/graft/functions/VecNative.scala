package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExprColumn
import org.apache.spark.sql.types._

/** Native (whole-stage-codegen) kernels for the vector/ANN family.
  *
  * The higher-order-function formulations (`aggregate(zip_with(...))`,
  * `array_min(transform(filter(...)))`) evaluate an interpreted lambda
  * per element — measured ~0.6 ms/row for the PQ encode argmin (m=8,
  * ksub=16, d=64), i.e. minutes per million rows, all on one core of
  * whatever task runs the projection. These expressions emit bare loops
  * over ArrayData / primitive arrays instead, with the SAME sequential
  * double arithmetic (left-to-right folds, same tie and NaN/-0.0
  * ordering as Spark's struct min/sort), so results are bit-identical —
  * VecNativeSpec pins native == HOF on randomized and adversarial
  * inputs, and the ANN oracle gates (q83/q208/q214/q215/q217/q222/
  * q231/q232) replay the full pipelines in DuckDB.
  *
  * Codebooks/centroid tables enter as ONE collapsed literal
  * ([[VecLit]]) instead of per-element `lit()` trees (thousands of
  * Literal nodes analyzed + constant-folded per action), and are parsed
  * once per (executor, expression) into primitive arrays via a
  * transient lazy val; codegen reaches them through
  * `ctx.addReferenceObj`.
  */
object VecLit {
  val doubleArr: ArrayType = ArrayType(DoubleType, containsNull = false)

  /** One collapsed Literal of the given type (vs per-element lit() trees). */
  def of(v: Any, dt: DataType): Column = ExprColumn.column(Literal.create(v, dt))

  def doubles(xs: Seq[Double]): Column = of(xs, doubleArr)

  def doubles2(xs: Seq[Seq[Double]]): Column =
    of(xs, ArrayType(doubleArr, containsNull = false))
}

private[graft] object VecNative {
  /** Spark's double ordering (Utils.nanSafeCompareDoubles): -0.0 == 0.0
    * (primitive ==), NaN == NaN and NaN greater than everything else. */
  def cmpD(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || (x == y)) 0
    else if (xn) 1
    else if (yn) -1
    else if (x > y) 1 else -1
  }

  def requireArrDouble(dt: DataType, what: String): TypeCheckResult = dt match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$what requires array<double|float>, got ${other.sql}")
  }

  /** Java source reading element `i` of ArrayData `a` as double. */
  def getD(a: String, i: String, elem: DataType): String = elem match {
    case FloatType => s"(double) $a.getFloat($i)"
    case _ => s"$a.getDouble($i)"
  }

  def elemOf(dt: DataType): DataType = dt.asInstanceOf[ArrayType].elementType
  def elemNullable(dt: DataType): Boolean = dt.asInstanceOf[ArrayType].containsNull

  /** The codebook/centroid child of the parse-at-planning kernels must be
    * a FOLDABLE literal of exactly `schema` — anything else used to fail
    * at runtime inside `right.eval(null)`/parse (ClassCastException/NPE)
    * instead of a clean analysis error (r18 ADVICE finding). */
  def requireFoldableLit(e: Expression, schema: DataType,
      what: String): TypeCheckResult =
    if (!e.foldable) TypeCheckResult.TypeCheckFailure(
      s"$what requires a foldable codebook/centroid literal")
    else if (e.dataType != schema) TypeCheckResult.TypeCheckFailure(
      s"$what codebook must be ${schema.sql}, got ${e.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
}

/** Parsed PQ codebook: per subspace the ascending cell ids and their
  * centroids (dropped-empty cells simply absent). */
final class PqCodebookData(val dsub: Int, val subCellIds: Array[Array[Int]],
    val subCents: Array[Array[Array[Double]]]) extends Serializable

object PqCodebookData {
  /** From a literal array<struct<sub:int, cell:int, c:array<double>>>. */
  def parse(arr: ArrayData): PqCodebookData = {
    val rows = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getInt(0), r.getInt(1), r.getArray(2).toDoubleArray)
    }
    require(rows.nonEmpty, "empty PQ codebook literal")
    val m = rows.iterator.map(_._1).max + 1
    val bySub = Array.tabulate(m)(s => rows.filter(_._1 == s).sortBy(_._2))
    new PqCodebookData(rows.head._3.length,
      bySub.map(_.map(_._2).toArray), bySub.map(_.map(_._3).toArray))
  }

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("sub", IntegerType, nullable = false),
    StructField("cell", IntegerType, nullable = false),
    StructField("c", VecLit.doubleArr, nullable = false))), containsNull = false)
}

/** Parsed IVF centroid table (cells in literal order — the argmin
  * tie-breaks on cell id, so order never matters). */
final class IvfCentsData(val cells: Array[Int], val cents: Array[Array[Double]],
    val norms: Array[Double]) extends Serializable

object IvfCentsData {
  /** From a literal array<struct<cell:int, c:array<double>, n:double>>. */
  def parse(arr: ArrayData): IvfCentsData = {
    val rows = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getInt(0), r.getArray(1).toDoubleArray, r.getDouble(2))
    }
    require(rows.nonEmpty, "empty IVF centroid literal")
    new IvfCentsData(rows.map(_._1).toArray, rows.map(_._2).toArray,
      rows.map(_._3).toArray)
  }

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("c", VecLit.doubleArr, nullable = false),
    StructField("n", DoubleType, nullable = false))), containsNull = false)
}

/** sqrt of the sequential sum of squares — `normPre` / `norm` native.
  * A null element yields null (the HOF fold's poisoned-sum behavior). */
case class NormL2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def checkInputDataTypes(): TypeCheckResult =
    VecNative.requireArrDouble(child.dataType, prettyName)

  // null result also on a null ELEMENT — declared honestly, and the
  // codegen only emits the isNull assignment when that can happen
  // (assigning ev.isNull under nullable=false fails janino compilation)
  override def nullable: Boolean = child.nullable || nullableElems

  private def elem = VecNative.elemOf(child.dataType)
  private def nullableElems = VecNative.elemNullable(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    val isFloat = elem == FloatType
    while (i < n) {
      if (nullableElems && arr.isNullAt(i)) return null
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      acc += x * x
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val x = ctx.freshName("x")
      val loop =
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  %s
           |  double $x = ${VecNative.getD(a, i, elem)};
           |  $acc += $x * $x;
           |}
         """.stripMargin
      if (nullableElems)
        s"""
           |boolean $bad = false;
           |${loop.format(s"if ($a.isNullAt($i)) { $bad = true; break; }")}
           |if ($bad) { ${ev.isNull} = true; }
           |else { ${ev.value} = java.lang.Math.sqrt($acc); }
         """.stripMargin
      else
        s"""
           |${loop.format("")}
           |${ev.value} = java.lang.Math.sqrt($acc);
         """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): NormL2 = copy(child = c)
}

/** Sequential dot product accepting float or double arrays (elements
  * cast exactly to double) — `dot` / `dotPre` native. Shorter length
  * governs (the [[DotProduct]] convention); a null element yields null. */
case class DotProd(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecNative.requireArrDouble(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecNative.requireArrDouble(right.dataType, prettyName)
  }

  // null result also on a null ELEMENT (see NormL2)
  override def nullable: Boolean = left.nullable || right.nullable ||
    VecNative.elemNullable(left.dataType) || VecNative.elemNullable(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = VecNative.elemOf(left.dataType) == FloatType
    val rf = VecNative.elemOf(right.dataType) == FloatType
    val ln = VecNative.elemNullable(left.dataType)
    val rn = VecNative.elemNullable(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if ((ln && x.isNullAt(i)) || (rn && y.isNullAt(i))) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val checks = Seq(
        if (VecNative.elemNullable(left.dataType)) Some(s"$a.isNullAt($i)") else None,
        if (VecNative.elemNullable(right.dataType)) Some(s"$b.isNullAt($i)") else None
      ).flatten
      val loop =
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  %s
           |  $acc += (${VecNative.getD(a, i, VecNative.elemOf(left.dataType))})
           |    * (${VecNative.getD(b, i, VecNative.elemOf(right.dataType))});
           |}
         """.stripMargin
      if (checks.nonEmpty)
        s"""
           |boolean $bad = false;
           |${loop.format(s"if (${checks.mkString(" || ")}) { $bad = true; break; }")}
           |if ($bad) { ${ev.isNull} = true; }
           |else { ${ev.value} = $acc; }
         """.stripMargin
      else
        s"""
           |${loop.format("")}
           |${ev.value} = $acc;
         """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProd =
    copy(left = l, right = r)
}

/** ADC table lookup: Σ_s table[s][codes[s]] (0-based, sequential adds).
  * `table` is array<array<double>>; when foldable (the single-query
  * path) it parses once to primitive double[][]. */
case class AdcLookup(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_lookup"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<array<double>>), got ${l.sql}, ${r.sql}")
  }

  @transient private lazy val constTable: Array[Array[Double]] =
    if (right.foldable) {
      val ad = right.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray)
    } else null

  override def nullSafeEval(c: Any, t: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    val ct = constTable
    if (ct != null) {
      while (s < m) { acc += ct(s)(codes.getInt(s)); s += 1 }
    } else {
      val tbl = t.asInstanceOf[ArrayData]
      while (s < m) { acc += tbl.getArray(s).getDouble(codes.getInt(s)); s += 1 }
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val body =
        if (right.foldable) {
          val ref = ctx.addReferenceObj("adcTable", constTable, "double[][]")
          s"$acc += $ref[$s][$c.getInt($s)];"
        } else s"$acc += $t.getArray($s).getDouble($c.getInt($s));"
      s"""
         |int $m = $c.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  $body
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcLookup =
    copy(left = l, right = r)
}

/** PQ encode: the m-byte code word (argmin cell per subspace by
  * sequential squared L2; ties and NaN per Spark's struct-min double
  * ordering — lowest cell wins ties). `cents` must be a foldable
  * [[PqCodebookData.schema]] literal. */
case class PqEncode(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecNative.requireArrDouble(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecNative.requireFoldableLit(right, PqCodebookData.schema, prettyName)
  }

  private def elem = VecNative.elemOf(left.dataType)
  private def isFloatElem = elem == FloatType

  @transient private lazy val cb: PqCodebookData =
    PqCodebookData.parse(right.eval(null).asInstanceOf[ArrayData])

  override def nullSafeEval(v: Any, c: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val m = cb.subCellIds.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val ids = cb.subCellIds(s)
      val cs = cb.subCents(s)
      var best = 0.0
      var bc = 0
      var first = true
      var ci = 0
      while (ci < cs.length) {
        val cent = cs(ci)
        val base = s * cb.dsub
        val nn = math.min(cent.length, vec.numElements() - base)
        var d = 0.0
        var j = 0
        while (j < nn) {
          val t = (if (isFloatElem) vec.getFloat(base + j).toDouble
                   else vec.getDouble(base + j)) - cent(j)
          d += t * t
          j += 1
        }
        if (first || VecNative.cmpD(d, best) < 0) { best = d; bc = ids(ci); first = false }
        ci += 1
      }
      out(s) = bc
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val ref = ctx.addReferenceObj("pqcb", cb, classOf[PqCodebookData].getName)
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val ci = ctx.freshName("ci")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val ids = ctx.freshName("ids")
      val cs = ctx.freshName("cs")
      val best = ctx.freshName("best")
      val bc = ctx.freshName("bc")
      val first = ctx.freshName("first")
      val cent = ctx.freshName("cent")
      val base = ctx.freshName("base")
      val nn = ctx.freshName("nn")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val dsub = ctx.freshName("dsub")
      s"""
         |int $m = $ref.subCellIds().length;
         |int $dsub = $ref.dsub();
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int[] $ids = $ref.subCellIds()[$s];
         |  double[][] $cs = $ref.subCents()[$s];
         |  double $best = 0.0; int $bc = 0; boolean $first = true;
         |  int $base = $s * $dsub;
         |  for (int $ci = 0; $ci < $cs.length; $ci++) {
         |    double[] $cent = $cs[$ci];
         |    int $nn = java.lang.Math.min($cent.length, $v.numElements() - $base);
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $nn; $j++) {
         |      double $t = ${VecNative.getD(v, s"$base + $j", elem)} - $cent[$j];
         |      $d += $t * $t;
         |    }
         |    if ($first || graft.functions.VecNative.cmpD($d, $best) < 0) {
         |      $best = $d; $bc = $ids[$ci]; $first = false;
         |    }
         |  }
         |  $out[$s] = $bc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(left = l, right = r)
}

/** Argmin codebook cell for ONE subvector within subspace `sub` — the
  * training-loop form of [[PqEncode]] (the subvector is already
  * sliced, base 0). Children: (sv, sub, cents-literal). */
case class PqNearestSub(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_nearest_sub"

  override def checkInputDataTypes(): TypeCheckResult = {
    val f = VecNative.requireArrDouble(first.dataType, prettyName)
    if (f != TypeCheckResult.TypeCheckSuccess) f
    else VecNative.requireFoldableLit(third, PqCodebookData.schema, prettyName)
  }

  private def elem = VecNative.elemOf(first.dataType)
  private def isFloatElem = elem == FloatType

  @transient private lazy val cb: PqCodebookData =
    PqCodebookData.parse(third.eval(null).asInstanceOf[ArrayData])

  override def nullSafeEval(sv: Any, sub: Any, c: Any): Any = {
    val vec = sv.asInstanceOf[ArrayData]
    val s = sub.asInstanceOf[Int]
    val ids = cb.subCellIds(s)
    val cs = cb.subCents(s)
    var best = 0.0
    var bc = 0
    var firstFlag = true
    var ci = 0
    while (ci < cs.length) {
      val cent = cs(ci)
      val nn = math.min(cent.length, vec.numElements())
      var d = 0.0
      var j = 0
      while (j < nn) {
        val t = (if (isFloatElem) vec.getFloat(j).toDouble
                 else vec.getDouble(j)) - cent(j)
        d += t * t
        j += 1
      }
      if (firstFlag || VecNative.cmpD(d, best) < 0) { best = d; bc = ids(ci); firstFlag = false }
      ci += 1
    }
    java.lang.Integer.valueOf(bc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, sub, _) => {
      val ref = ctx.addReferenceObj("pqcb", cb, classOf[PqCodebookData].getName)
      val ids = ctx.freshName("ids")
      val cs = ctx.freshName("cs")
      val best = ctx.freshName("best")
      val bc = ctx.freshName("bc")
      val firstF = ctx.freshName("firstF")
      val ci = ctx.freshName("ci")
      val cent = ctx.freshName("cent")
      val nn = ctx.freshName("nn")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      s"""
         |int[] $ids = $ref.subCellIds()[$sub];
         |double[][] $cs = $ref.subCents()[$sub];
         |double $best = 0.0; int $bc = 0; boolean $firstF = true;
         |for (int $ci = 0; $ci < $cs.length; $ci++) {
         |  double[] $cent = $cs[$ci];
         |  int $nn = java.lang.Math.min($cent.length, $sv.numElements());
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $nn; $j++) {
         |    double $t = ${VecNative.getD(sv, j, elem)} - $cent[$j];
         |    $d += $t * $t;
         |  }
         |  if ($firstF || graft.functions.VecNative.cmpD($d, $best) < 0) {
         |    $best = $d; $bc = $ids[$ci]; $firstF = false;
         |  }
         |}
         |${ev.value} = $bc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): PqNearestSub = copy(first = f, second = s, third = t)
}

/** IVF nearest-centroid assignment: argmin over centroids of
  * -(dot/denom) with the 0.0 zero-denominator sentinel, ties to the
  * lowest cell ([[graft.vector.Ivf.assign]]'s struct-min semantics).
  * `cents` must be a foldable [[IvfCentsData.schema]] literal. */
case class IvfAssign(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_assign"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecNative.requireArrDouble(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecNative.requireFoldableLit(right, IvfCentsData.schema, prettyName)
  }

  private def elem = VecNative.elemOf(left.dataType)
  private def isFloatElem = elem == FloatType

  @transient private lazy val cd: IvfCentsData =
    IvfCentsData.parse(right.eval(null).asInstanceOf[ArrayData])

  override def nullSafeEval(v: Any, c: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var nv = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloatElem) vec.getFloat(i).toDouble else vec.getDouble(i)
      nv += x * x; i += 1
    }
    nv = math.sqrt(nv)
    var bestNeg = 0.0
    var bestCell = 0
    var firstFlag = true
    i = 0
    while (i < cd.cells.length) {
      val cent = cd.cents(i)
      val denom = nv * cd.norms(i)
      var neg = 0.0
      if (denom > 0) {
        val nn = math.min(cent.length, n)
        var dot = 0.0
        var j = 0
        while (j < nn) {
          dot += (if (isFloatElem) vec.getFloat(j).toDouble
                  else vec.getDouble(j)) * cent(j)
          j += 1
        }
        neg = -(dot / denom)
      }
      val cmp = VecNative.cmpD(neg, bestNeg)
      if (firstFlag || cmp < 0 || (cmp == 0 && cd.cells(i) < bestCell)) {
        bestNeg = neg; bestCell = cd.cells(i); firstFlag = false
      }
      i += 1
    }
    java.lang.Integer.valueOf(bestCell)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val ref = ctx.addReferenceObj("ivfcd", cd, classOf[IvfCentsData].getName)
      val n = ctx.freshName("n")
      val nv = ctx.freshName("nv")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val bestNeg = ctx.freshName("bestNeg")
      val bestCell = ctx.freshName("bestCell")
      val firstF = ctx.freshName("firstF")
      val cent = ctx.freshName("cent")
      val denom = ctx.freshName("denom")
      val neg = ctx.freshName("neg")
      val nn = ctx.freshName("nn")
      val dot = ctx.freshName("dot")
      val cmp = ctx.freshName("cmp")
      val x = ctx.freshName("x")
      s"""
         |int $n = $v.numElements();
         |double $nv = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${VecNative.getD(v, i, elem)};
         |  $nv += $x * $x;
         |}
         |$nv = java.lang.Math.sqrt($nv);
         |double $bestNeg = 0.0; int $bestCell = 0; boolean $firstF = true;
         |for (int $i = 0; $i < $ref.cells().length; $i++) {
         |  double[] $cent = $ref.cents()[$i];
         |  double $denom = $nv * $ref.norms()[$i];
         |  double $neg = 0.0;
         |  if ($denom > 0) {
         |    int $nn = java.lang.Math.min($cent.length, $n);
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $nn; $j++) { $dot += ${VecNative.getD(v, j, elem)} * $cent[$j]; }
         |    $neg = -($dot / $denom);
         |  }
         |  int $cmp = graft.functions.VecNative.cmpD($neg, $bestNeg);
         |  if ($firstF || $cmp < 0 || ($cmp == 0 && $ref.cells()[$i] < $bestCell)) {
         |    $bestNeg = $neg; $bestCell = $ref.cells()[$i]; $firstF = false;
         |  }
         |}
         |${ev.value} = $bestCell;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IvfAssign =
    copy(left = l, right = r)
}

/** The `n` nearest cells of a vector per the centroid literal, in probe
  * order — [[graft.vector.AnnIndex]]'s `nearestCellsCol` semantics:
  * sort (negSim, cell) ascending where zero-denominator scores the
  * +1.0 ranks-LAST sentinel (NOT [[IvfAssign]]'s 0.0), take the first
  * `n` cell ids. Children: (vec, vecNorm, cents-literal); `n` is a
  * constructor param (plan-time constant). */
case class IvfProbeCells(first: Expression, second: Expression, third: Expression,
    n: Int) extends TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probe_cells"

  override def checkInputDataTypes(): TypeCheckResult = {
    val f = VecNative.requireArrDouble(first.dataType, prettyName)
    if (f != TypeCheckResult.TypeCheckSuccess) f
    else VecNative.requireFoldableLit(third, IvfCentsData.schema, prettyName)
  }

  private def elem = VecNative.elemOf(first.dataType)
  private def isFloatElem = elem == FloatType

  @transient private lazy val cd: IvfCentsData =
    IvfCentsData.parse(third.eval(null).asInstanceOf[ArrayData])

  override def nullSafeEval(v: Any, vnAny: Any, c: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val vn = vnAny.asInstanceOf[Double]
    val k = cd.cells.length
    val negs = new Array[Double](k)
    val cells = new Array[Int](k)
    var i = 0
    while (i < k) {
      val cent = cd.cents(i)
      val denom = vn * cd.norms(i)
      var neg = 1.0
      if (denom > 0) {
        val nn = math.min(cent.length, vec.numElements())
        var dot = 0.0
        var j = 0
        while (j < nn) {
          dot += (if (isFloatElem) vec.getFloat(j).toDouble
                  else vec.getDouble(j)) * cent(j)
          j += 1
        }
        neg = -(dot / denom)
      }
      negs(i) = neg
      cells(i) = cd.cells(i)
      i += 1
    }
    IvfProbeCells.sortTake(negs, cells, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, vn, _) => {
      val ref = ctx.addReferenceObj("ivfcd", cd, classOf[IvfCentsData].getName)
      val k = ctx.freshName("k")
      val negs = ctx.freshName("negs")
      val cells = ctx.freshName("cells")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cent = ctx.freshName("cent")
      val denom = ctx.freshName("denom")
      val neg = ctx.freshName("neg")
      val nn = ctx.freshName("nn")
      val dot = ctx.freshName("dot")
      s"""
         |int $k = $ref.cells().length;
         |double[] $negs = new double[$k];
         |int[] $cells = new int[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  double[] $cent = $ref.cents()[$i];
         |  double $denom = $vn * $ref.norms()[$i];
         |  double $neg = 1.0;
         |  if ($denom > 0) {
         |    int $nn = java.lang.Math.min($cent.length, $v.numElements());
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $nn; $j++) { $dot += ${VecNative.getD(v, j, elem)} * $cent[$j]; }
         |    $neg = -($dot / $denom);
         |  }
         |  $negs[$i] = $neg;
         |  $cells[$i] = $ref.cells()[$i];
         |}
         |${ev.value} = graft.functions.IvfProbeCells.sortTake($negs, $cells, $n);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): IvfProbeCells = copy(first = f, second = s, third = t)
}

object IvfProbeCells {
  /** Insertion-sort (negSim, cell) ascending with Spark's double
    * ordering, return the first min(n, k) cells — tiny k (nlist). */
  def sortTake(negs: Array[Double], cells: Array[Int], n: Int): GenericArrayData = {
    val k = negs.length
    var i = 1
    while (i < k) {
      val dn = negs(i)
      val dc = cells(i)
      var j = i - 1
      while (j >= 0 && {
        val c = VecNative.cmpD(negs(j), dn)
        c > 0 || (c == 0 && cells(j) > dc)
      }) {
        negs(j + 1) = negs(j)
        cells(j + 1) = cells(j)
        j -= 1
      }
      negs(j + 1) = dn
      cells(j + 1) = dc
      i += 1
    }
    val take = math.min(n, k)
    val out = new Array[Int](take)
    System.arraycopy(cells, 0, out, 0, take)
    new GenericArrayData(out)
  }
}
