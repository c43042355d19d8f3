package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index over 2 or 3 bucket ids in [0, 2^bits) — the
  * clustering key behind `OPTIMIZE ... HILBERT` (`tables/Maintenance`).
  * The Hilbert curve visits every cell of the 2^bits-per-side grid with
  * CONSECUTIVE indices always one Manhattan step apart (the property
  * the Z-curve lacks: z-values jump across quadrant seams, so a box
  * query straddling a seam reads file ranges the box never touches).
  *
  * 2-D: classic xy2d bit loop (Hilbert 1891; the Wikipedia/Hamilton
  * form). 3-D: Skilling's transpose transform ("Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 2004 — the standard compact
  * Butz/Hamilton generalization): inverse-undo + Gray-encode the
  * coordinate words in place, then bit-interleave the transpose into
  * one index. Inputs clamp into the grid so out-of-range bucket ids
  * cannot produce colliding or negative indices.
  *
  * Codegen'd (`doGenCode` calls the static kernels) so the layout pass
  * computes indices inside the projection, like [[RollingHash]].
  */
object HilbertKernel {
  /** xy2d for an n×n grid, n = 1 << bits. */
  def xy2d(bits: Int, xIn: Long, yIn: Long): Long = {
    val n = 1L << bits
    var x = math.min(math.max(xIn, 0L), n - 1)
    var y = math.min(math.max(yIn, 0L), n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the quadrant
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** xyz2d for an n×n×n grid, n = 1 << bits (Skilling's
    * AxesToTranspose followed by bit interleave). */
  def xyz2d(bits: Int, xIn: Long, yIn: Long, zIn: Long): Long = {
    val dims = 3
    val cap = (1L << bits) - 1
    val X = new Array[Long](dims)
    X(0) = math.min(math.max(xIn, 0L), cap)
    X(1) = math.min(math.max(yIn, 0L), cap)
    X(2) = math.min(math.max(zIn, 0L), cap)
    // inverse undo: top bit down to bit 1
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < dims) {
        if ((X(i) & q) != 0) X(0) ^= p // invert low bits of X(0)
        else { // exchange low bits of X(0) and X(i)
          val t = (X(0) ^ X(i)) & p
          X(0) ^= t
          X(i) ^= t
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < dims) { X(i) ^= X(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((X(dims - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < dims) { X(i) ^= t; i += 1 }
    // untranspose: interleave bit k of each axis word, high bit first
    var d = 0L
    var k = bits - 1
    while (k >= 0) {
      var j = 0
      while (j < dims) {
        d = (d << 1) | ((X(j) >>> k) & 1L)
        j += 1
      }
      k -= 1
    }
    d
  }
}

/** 8 bits/dim = the 256 equi-depth buckets Maintenance's curve layouts
  * use (matching the z-value's ZBitsPerColumn). */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  private val Bits = 8

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hilbert_index requires bigint bucket ids, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(HilbertKernel.xy2d(Bits,
      a.asInstanceOf[Long], b.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertKernel.xy2d($Bits, $a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

/** 3-D variant — same 8 bits/dim, Skilling transform kernel. */
case class HilbertIndex3(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  private val Bits = 8

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_index requires bigint bucket ids, got " +
          children.map(_.dataType.sql).mkString(", "))

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    java.lang.Long.valueOf(HilbertKernel.xyz2d(Bits,
      a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.HilbertKernel.xyz2d($Bits, $a, $b, $c);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): HilbertIndex3 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HilbertIndex {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_index", {
        case Seq(x, y) => HilbertIndex(x, y)
        case Seq(x, y, z) => HilbertIndex3(x, y, z)
        case other =>
          // the same AnalysisException (WRONG_NUM_ARGS, sqlState 42605)
          // Spark raises for arity mismatches on built-in functions — a
          // bare IllegalArgumentException surfaced to SQL users as an
          // internal error (review finding); the type path already goes
          // through checkInputDataTypes
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`hilbert_index`",
              "expectedNum" -> "[2, 3]",
              "actualNum" -> other.size.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
      }, "scala_udf")

  def hilbert_index(spark: SparkSession, x: Column, y: Column): Column = {
    register(spark)
    call_function("hilbert_index", x, y)
  }

  def hilbert_index(spark: SparkSession, x: Column, y: Column, z: Column): Column = {
    register(spark)
    call_function("hilbert_index", x, y, z)
  }
}
