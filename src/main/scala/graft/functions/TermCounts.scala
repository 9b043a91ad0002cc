package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel: occurrence counts of a fixed term list in one token-array
  * traversal. `term_counts(toks, [t1..tk])` returns `array<bigint>` where
  * slot i = |{ j : toks[j] = t_i }| — exactly `size(filter(toks, x -> x = t_i))`
  * per term, but ALL terms are counted in a single compiled pass instead of
  * k interpreted higher-order `filter` scans (HOF lambdas never enter
  * whole-stage codegen — the same anti-pattern the round-1 measurements
  * banned from hot paths; see [[WordShingles]]/[[graft.functions]] for the
  * precedent). Null tokens match nothing (as `x === t` is null ⇒ filtered). */
object TermCountsImpl {
  def counts(toks: ArrayData, terms: Array[UTF8String]): ArrayData = {
    val out = new Array[Long](terms.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val tok = toks.getUTF8String(i)
      if (tok != null) {
        var j = 0
        while (j < terms.length) {
          if (terms(j).equals(tok)) out(j) += 1
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Custom codegen expression: `term_counts(tokens, terms)`. */
case class TermCounts(child: Expression, terms: Seq[String]) extends UnaryExpression {
  require(terms.nonEmpty, "give at least one term")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"term_counts requires array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "term_counts"

  @transient private lazy val termsU8: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override def nullSafeEval(v: Any): Any =
    TermCountsImpl.counts(v.asInstanceOf[ArrayData], termsU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("terms", termsU8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCountsImpl.counts($c, $termsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCountsFunctions {
  def term_counts(toks: Column, terms: Seq[String]): Column =
    Bridge.column(TermCounts(Bridge.expression(toks), terms))
}
