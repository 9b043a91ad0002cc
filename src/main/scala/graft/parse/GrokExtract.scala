package graft.parse

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for the one-pass grok extract; static forwarders let generated code
  * call `graft.parse.GrokImpl.extract(...)`. Returns null on non-match.
  *
  * Per-row allocation discipline (JFR-measured, round 7: the old body was
  * the map stage's top allocator — a fresh Matcher, five group-String
  * substrings and four UTF-8 re-encodes per row):
  *  - the MATCHER is reused across rows (a lazily-initialized mutable field
  *    of the codegen object, reset per row — the same pattern Spark's own
  *    RegExpExtract generates); the interpreted entry still allocates one
  *    per call, since a shared Expression instance must stay thread-safe;
  *  - on the all-ASCII path (`UTF8String.isFullAscii`, the log hot path)
  *    char offsets equal byte offsets AND `toString` was exact, so group
  *    values are BYTE SLICES of one private copy of the row's bytes —
  *    bit-identical to substring+re-encode, with zero per-group copies.
  *    `dur` parses straight out of the matched String
  *    (`Integer.parseInt(CharSequence, from, to, 10)` — no substring).
  *    Non-ASCII (or invalid-UTF-8, where toString substitutes U+FFFD and
  *    offsets diverge) rows take the original String-group formulation. */
object GrokImpl {

  /** Interpreted-path entry (non-codegen eval): allocates its own matcher —
    * the owning Expression instance may be shared across threads. */
  def extract(p: Pattern, s: UTF8String): InternalRow =
    extract(p.matcher(""), s)

  /** Codegen entry: `m` is the caller's reusable matcher (one per codegen
    * object, single-threaded by construction), reset here per row. */
  def extract(m: Matcher, s: UTF8String): InternalRow = {
    val str = s.toString
    m.reset(str)
    if (!m.matches()) return null
    if (s.isFullAscii()) {
      val dStart = m.start(3)
      // a non-participating dur group returns start -1; the String path
      // reaches the same verdict via parseInt(null) → NumberFormatException
      if (dStart < 0) return null
      val dur =
        try Integer.parseInt(str, dStart, m.end(3), 10)
        catch { case _: NumberFormatException => return null }
      val all = new Array[Byte](s.numBytes)
      s.writeToMemory(all, Platform.BYTE_ARRAY_OFFSET)
      new GenericInternalRow(Array[Any](
        asciiGroup(m, all, 1), asciiGroup(m, all, 2), dur,
        asciiGroup(m, all, 4), asciiGroup(m, all, 5)))
    } else {
      val dur =
        try java.lang.Integer.parseInt(m.group(3))
        catch { case _: NumberFormatException => return null }
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(m.group(1)),
        UTF8String.fromString(m.group(2)),
        dur,
        UTF8String.fromString(m.group(4)),
        UTF8String.fromString(m.group(5))))
    }
  }

  /** Group `i` as a byte slice of `all` (valid only when the input was full
    * ASCII); null for a non-participating group, like `fromString(null)`. */
  private def asciiGroup(m: Matcher, all: Array[Byte], i: Int): UTF8String = {
    val st = m.start(i)
    if (st < 0) null else UTF8String.fromBytes(all, st, m.end(i) - st)
  }
}

/** Vectorized single-pass grok: ONE compiled regex, ONE execution per row,
  * all capture groups materialized into a struct.
  *
  * Rationale (north_star "vectorized grok/regex parser"): composing built-in
  * `regexp_extract` costs one full regex execution per extracted field (5× on
  * the 10^12-row hot path); Catalyst does not CSE them. This expression is
  * case (b) of the custom-operator preference order — a codegen'd scalar
  * expression, the regex Pattern compiled once per task via addReferenceObj,
  * the generated code a single static call inside whole-stage codegen.
  */
case class GrokExtract(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val compiled = Pattern.compile(pattern)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"grok_extract requires string, got $other")
    }

  override def dataType: DataType = GrokExtract.schema

  override def nullable: Boolean = true

  override def prettyName: String = "grok_extract"

  override def nullSafeEval(v: Any): Any =
    GrokImpl.extract(compiled, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("grokPattern", compiled, classOf[Pattern].getName)
    // reusable matcher: lazy per-row init (the RegExpExtract precedent)
    // sidesteps references-vs-constructor ordering in the generated class
    val matcherRef = ctx.addMutableState(
      classOf[Matcher].getName, "grokMatcher")
    val childGen = child.genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $rowCls ${ev.value} = null;
      if (!${childGen.isNull}) {
        if ($matcherRef == null) { $matcherRef = $patRef.matcher(""); }
        ${ev.value} = graft.parse.GrokImpl.extract($matcherRef, ${childGen.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): GrokExtract =
    copy(child = newChild)
}

object GrokExtract {
  val schema: StructType = StructType(Seq(
    StructField("level", StringType),
    StructField("tool", StringType),
    StructField("dur_ms", IntegerType),
    StructField("status", StringType),
    StructField("payload", StringType)))

  def grok_extract(text: Column, pattern: String): Column =
    Bridge.column(GrokExtract(Bridge.expression(text), pattern))
}
