package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static per-row text kernels + their native Catalyst expressions.
  *
  * Both were Scala UDFs; as UDFs every row pays the Catalyst↔Scala
  * boundary (UTF8String → String → result → re-encode, plus the
  * closure-call indirection whole-stage codegen can't see through). As
  * expressions the generated code calls these static kernels directly
  * inside the codegen'd projection — same-sitting alternating A/B on
  * the 5 M-doc corpus (ProfTextKernel): entropy 2.86 → 1.08 s (2.6×,
  * the ASCII-array histogram + no boundary), nfc 1.48 → 1.33 s (1.1×
  * — the Normalizer call dominates that kernel). Semantics are pinned
  * by the q269/q271 oracles (which did not move) and TextSpec.
  */
object TextKernels {

  /** Unicode NFC composition (JDK Normalizer tables; DuckDB's
    * nfc_normalize agrees — the q269 contract). */
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** Shannon entropy (bits per CODEPOINT) of the string's codepoint
    * histogram; caller guarantees non-empty. Deterministic accumulation
    * order (ascending codepoints: the ASCII array walks 0..127, the
    * overflow TreeMap continues from 128 — together a sorted sweep) so
    * the 4-dp rounded value can't flake against the oracle's grouped
    * sum. ASCII counts live in a primitive array — the per-character
    * hot path allocates nothing for ASCII-dominant corpora; only
    * non-ASCII codepoints touch the boxed map. */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    val ascii = new Array[Long](128)
    var other: java.util.TreeMap[Integer, Long] = null
    var n = 0.0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new java.util.TreeMap[Integer, Long]()
        val old = other.get(cp)
        other.put(cp, if (old == null) 1L else old + 1L)
      }
      n += 1.0
      i += Character.charCount(cp)
    }
    var acc = 0.0
    var c = 0
    while (c < 128) {
      if (ascii(c) > 0L) {
        val p = ascii(c) / n
        acc += p * math.log(p)
      }
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val p = it.next() / n
        acc += p * math.log(p)
      }
    }
    -acc / math.log(2.0)
  }
}

/** NFC normalization as a native unary expression (string → string,
  * null-safe). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    TextKernels.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Shannon codepoint entropy as a native unary expression (string →
  * double; NULL for null or empty input — an empty histogram has no
  * entropy, matching the UDF it replaced). */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_entropy"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_char_entropy requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    if (s.numBytes() == 0) null
    else java.lang.Double.valueOf(TextKernels.charEntropy(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numBytes() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.TextKernels.charEntropy($c);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}
