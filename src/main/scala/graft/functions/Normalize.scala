package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel shared by interpreted eval and generated code (static forwarder —
  * see [[SimHashImpl]] for the pattern). */
object NormalizeImpl {

  /** Unicode NFC normalization. ASCII fast path: NFC over pure-ASCII bytes is
    * the identity, so a byte scan (no String materialization at all) returns
    * the input UTF8String unchanged for the overwhelmingly-ASCII common case;
    * only rows containing a >=0x80 byte pay the decode + isNormalized check. */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s // pure ASCII: zero-copy identity
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Native Catalyst expression: Unicode NFC normalization of a string column —
  * the canonicalization step every dedup/fingerprint pipeline needs before
  * hashing (composed vs decomposed accents would otherwise defeat exact
  * dedup). Case (b) of the custom-operator preference order (SURVEY.md §2.8):
  * no Spark built-in exposes ICU/JDK normalization, and a Scala UDF would
  * leave whole-stage codegen; this stays a static call inside it. DuckDB's
  * `nfc_normalize` is the exact oracle twin.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize requires string, got $other")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    NormalizeImpl.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeImpl.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeFunctions {
  /** Column API for [[NormalizeNfc]]. */
  def nfc_normalize(text: Column): Column =
    Bridge.column(NormalizeNfc(Bridge.expression(text)))
}
