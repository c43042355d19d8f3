package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 56-bit polynomial rolling hash of a string
  * (document fingerprinting, SURVEY north-star "rolling hash").
  *
  * h ← (h·31 + byte) mod 2^56 — the modulus keeps the value inside the
  * positive long range so the same function is expressible in ANSI SQL
  * (the DuckDB oracle replays it with `list_reduce`), and the hash is
  * stable across engines and platforms, unlike xxhash64 seeds.
  *
  * Implemented with `doGenCode` (a tight per-byte loop in generated Java),
  * so it participates in whole-stage codegen instead of falling back to
  * interpreted eval — measurably cheaper than sha2 for fingerprint-only
  * use, with no crypto guarantee (use `TextOps.fingerprint` when collision
  * resistance matters).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  private val Mask = (1L << 56) - 1

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xffL)) & Mask
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xffL)) & ${Mask}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object GraftFunctions {

  /** Register engine-native functions for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_char_entropy", exprs => CharEntropy(exprs.head), "scala_udf")
  }

  /** Column API for the native text kernels — built DIRECTLY from the
    * expression (`classic.ExpressionUtils.column`, the public Spark 4
    * node↔expression bridge), so the returned Column analyzes in ANY
    * session. The earlier registry route registered the temp function
    * on `SparkSession.active`, which can differ from the session that
    * later analyzes the Column (multi-session apps/tests) and fail
    * unresolved (review finding); `register` remains for SQL-text use. */
  def graft_nfc(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ExprColumn
    ExprColumn.column(NfcNormalize(ExprColumn.expression(c)))
  }

  def graft_char_entropy(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ExprColumn
    ExprColumn.column(CharEntropy(ExprColumn.expression(c)))
  }

  /** Column API for rolling_hash: goes through the function registry
    * (`call_function`) — Spark 4 columns wrap ColumnNodes and the
    * expression-backed Column constructor is private to Spark. */
  def rolling_hash(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("rolling_hash", c)
  }
}
