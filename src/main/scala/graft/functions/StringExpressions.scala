package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization helper, referenced from both the interpreted
  * and the generated code paths. The `isNormalized` probe makes the
  * common case (already-NFC text, i.e. virtually all real corpora)
  * allocation-free: the input UTF8String is returned as-is and only
  * denormalized strings pay the String round-trip. */
object GraftNfcUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `graft_nfc(string)` — Unicode NFC normalization as a native Catalyst
  * expression. Spark has no built-in normalizer (the usual fallback is a
  * Scala UDF, which breaks whole-stage codegen and adds per-row
  * SerDe); this stays inside the generated plan by emitting a call to
  * the JVM's `java.text.Normalizer` through [[GraftNfcUtil]] — exactly
  * how Spark's own string expressions lean on UTF8String intrinsics.
  * Canonical equivalence (composed vs combining-mark forms) is the text
  * preprocessing a dedup/checksum pipeline must collapse before hashing:
  * "café" in NFD and NFC hash differently raw, identically after this. */
case class GraftNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${child.dataType.simpleString}")
  override def prettyName: String = "graft_nfc"
  override def nullSafeEval(input: Any): Any =
    GraftNfcUtil.nfc(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftNfcUtil.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): GraftNfc =
    copy(child = newChild)
}
