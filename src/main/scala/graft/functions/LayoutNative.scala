package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native equi-depth bucket id for the OPTIMIZE z/hilbert layout pass.
  *
  * Replaces `size(filter(array(<255 bound literals>), b => x >= b))` —
  * a higher-order function interpreted per ELEMENT per row, and
  * referenced 8×·|cols| times by the bit-interleave, so the old form ran
  * ~2×8×255 interpreted comparisons per row per curve column, twice per
  * rewrite (range-partitioner sampling pass + the shuffle itself) —
  * measured as the in-OPTIMIZE wall of q245 (guide §4: no interpreted
  * expressions in the hot path).
  *
  * Exact replacement semantics (pinned in LayoutNativeSpec): result =
  * count of bounds b with `x >= b` under SPARK's double comparison
  * (nanSafeCompareDoubles: NaN is the GREATEST value and equal to
  * itself; -0.0 == 0.0) —
  *   - null x → 0 (the lambda is null, filter keeps nothing);
  *   - NaN x → every bound counts (NaN >= anything, incl. NaN bounds);
  *   - non-NaN x: NaN bounds never count (x >= NaN only for NaN x) —
  *     the constructor strips them so the binary search sees a
  *     totally-ordered array, and remembers how many it stripped;
  *   - -0.0/0.0 compare equal (primitive <=, same as Spark's == branch).
  * The binary search (first index with bounds[i] > x) equals the count
  * because the array is ascending under primitive <=.
  */
case class BucketIdx(child: Expression, boundsRaw: Array[Double])
    extends UnaryExpression {

  // ascending, NaN-free; primitive comparisons below match Spark's
  // `>=` element-wise filter exactly for non-NaN inputs (see class doc);
  // a NaN input counts every bound, NaN bounds included
  private val bounds: Array[Double] = boundsRaw.filterNot(_.isNaN)
  private val nAll: Int = boundsRaw.length

  override def dataType: DataType = LongType
  override def prettyName: String = "bucket_idx"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument, got ${child.dataType.sql}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else java.lang.Long.valueOf(
      BucketIdx.count(bounds, nAll, v.asInstanceOf[Double]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val b = ctx.addReferenceObj("bounds", bounds, "double[]")
    val c = child.genCode(ctx)
    val v = ctx.freshName("v")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    ev.copy(isNull = FalseLiteral, code =
      code"""
        ${c.code}
        long ${ev.value} = 0L;
        if (!(${c.isNull})) {
          double $v = ${c.value};
          if (Double.isNaN($v)) {
            ${ev.value} = ${nAll}L;
          } else {
            int $lo = 0, $hi = $b.length;
            while ($lo < $hi) {
              int $mid = ($lo + $hi) >>> 1;
              if ($b[$mid] <= $v) $lo = $mid + 1; else $hi = $mid;
            }
            ${ev.value} = (long) $lo;
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): BucketIdx =
    copy(child = newChild)
}

object BucketIdx {
  /** count of bounds b with `v >= b` under Spark double comparison;
    * `bounds` ascending NaN-free, `nAll` the pre-strip length. */
  def count(bounds: Array[Double], nAll: Int, v: Double): Long = {
    if (java.lang.Double.isNaN(v)) return nAll.toLong // NaN is greatest
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}

object LayoutNative {
  /** Column API (graftbridge, session-independent — see GraftFunctions). */
  def bucketIdx(c: Column, bounds: Array[Double]): Column = {
    import org.apache.spark.sql.graftbridge.ExprColumn
    ExprColumn.column(BucketIdx(ExprColumn.expression(c), bounds))
  }
}
