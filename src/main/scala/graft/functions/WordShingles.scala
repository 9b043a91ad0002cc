package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel: normalized word w-shingles of a text. Normalization matches
  * dedup.ExactDedup.normalized (lower, whitespace runs → single space, trim).
  * Texts shorter than w words yield one shingle = the whole normalized text. */
object WordShinglesImpl {
  def shingles(text: UTF8String, w: Int): ArrayData = {
    // UTF8String.toLowerCase == Spark's lower(): locale-independent, unlike
    // String.toLowerCase (which under e.g. a Turkish default locale maps
    // 'I'→'ı' and would silently change shingles/signatures)
    val words = text.toLowerCase.toString.trim.split("\\s+").filter(_.nonEmpty)
    if (words.length == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    if (words.length < w)
      return new GenericArrayData(Array[Any](UTF8String.fromString(words.mkString(" "))))
    val out = new Array[Any](words.length - w + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Custom codegen expression: `word_shingles(text, w)` — replaces the
  * interpreted `transform(sequence(...), i -> concat_ws(slice(words, i, w)))`
  * higher-order formulation on the dedup hot path (HOF lambdas never enter
  * whole-stage codegen). */
case class WordShingles(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0 && w <= 32, s"shingle width out of range: $w")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles requires string, got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any =
    WordShinglesImpl.shingles(v.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShinglesImpl.shingles($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShinglesFunctions {
  def word_shingles(text: Column, w: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), w))
}
