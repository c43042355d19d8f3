package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert-curve index over two bucket ids in [0, 2^bits) — the
  * clustering key behind `OPTIMIZE ... HILBERT` (`tables/Maintenance`).
  * The Hilbert curve visits every cell of the 2^bits × 2^bits grid with
  * CONSECUTIVE indices always one Manhattan step apart (the property
  * the Z-curve lacks: z-values jump across quadrant seams, so a box
  * query straddling a seam reads file ranges the box never touches).
  * Classic xy2d bit loop (Hilbert 1891; the Wikipedia/Hamilton form);
  * inputs clamp into the grid so out-of-range bucket ids cannot produce
  * colliding or negative indices.
  *
  * Codegen'd (`doGenCode` calls the static kernel) so the layout pass
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
}

case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  /** 8 bits/dim = the 256 equi-depth buckets Maintenance's curve
    * layouts use (matching the z-value's ZBitsPerColumn). */
  private val Bits = 8

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hilbert_index requires two bigint bucket ids, got ${l.sql}, ${r.sql}")
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

object HilbertIndex {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_index", exprs => HilbertIndex(exprs(0), exprs(1)), "scala_udf")

  def hilbert_index(spark: SparkSession, x: Column, y: Column): Column = {
    register(spark)
    call_function("hilbert_index", x, y)
  }
}
