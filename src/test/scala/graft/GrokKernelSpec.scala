package graft

import java.util.regex.Pattern

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.parse.{GrokExtract, GrokImpl, GrokParser}

/** Parity laws for the round-7 GrokImpl allocation rework: the reused-matcher
  * + ASCII-byte-slice fast path must be indistinguishable from the original
  * per-row String formulation on every input class — ASCII, multi-byte
  * UTF-8, INVALID UTF-8 (where toString substitutes U+FFFD and byte/char
  * offsets diverge, so the fast path must refuse), non-participating
  * optional groups, malformed rows, and dur overflow. */
class GrokKernelSpec extends SparkSpec {

  private val pat = Pattern.compile(GrokParser.Pattern)

  /** The pre-rework reference semantics, verbatim. */
  private def reference(s: UTF8String): Seq[Any] = {
    val m = pat.matcher(s.toString)
    if (!m.matches()) return null
    val dur =
      try java.lang.Integer.parseInt(m.group(3))
      catch { case _: NumberFormatException => return null }
    Seq(UTF8String.fromString(m.group(1)), UTF8String.fromString(m.group(2)),
      dur, UTF8String.fromString(m.group(4)), UTF8String.fromString(m.group(5)))
  }

  private def kernel(s: UTF8String): Seq[Any] = {
    val row = GrokImpl.extract(pat, s)
    if (row == null) null
    else Seq(row.get(0, null), row.get(1, null), row.getInt(2),
      row.get(3, null), row.get(4, null))
  }

  test("kernel == reference on ASCII, multi-byte UTF-8 and malformed rows") {
    val cases = Seq(
      "[INFO] tool=bash dur=42ms status=ok hello world",
      "[ERROR] tool=edit dur=0ms status=err ",            // empty-adjacent payload
      "[WARN] tool=grep dur=999999ms status=ok x",
      "[INFO] tool=bash dur=42ms status=ok café 中文 😀", // 2/3/4-byte UTF-8 payload
      "[INFO] tool=bash dur=99999999999999ms status=ok overflow",  // dur > Int.MaxValue
      "?raw? not a log line",
      "[INFO] tool=BASH dur=42ms status=ok case mismatch") // tool class is [a-z]+
    cases.foreach { c =>
      val u = UTF8String.fromString(c)
      assert(kernel(u) === reference(u), s"diverged on: $c")
    }
  }

  test("invalid UTF-8 bytes take the String path (offsets diverge from bytes)") {
    // 0x80 decodes to U+FFFD: one byte -> one char, so a naive length check
    // would wrongly take the byte-slice path and emit the RAW 0x80 byte
    // where the reference emits U+FFFD's three UTF-8 bytes
    val prefix = "[INFO] tool=bash dur=7ms status=ok p".getBytes("UTF-8")
    val bytes = prefix :+ 0x80.toByte
    val u = UTF8String.fromBytes(bytes)
    assert(!u.isFullAscii())
    val k = kernel(u)
    assert(k === reference(u))
    // and the payload really is the substituted form, not the raw byte
    assert(k(4).asInstanceOf[UTF8String].toString.endsWith("p�"))
  }

  test("non-participating optional groups yield null fields / null row") {
    // dur group optional and absent -> whole row null (parseInt(null) path)
    val optDur = Pattern.compile("^a(b)(c)(?:(\\d+))?(d)(e)$")
    assert(GrokImpl.extract(optDur, UTF8String.fromString("abcde")) == null)
    // string group optional and absent -> that field null, row present
    val optPay = Pattern.compile("^a(b)(c)(\\d+)(d)(x)?$")
    val row = GrokImpl.extract(optPay, UTF8String.fromString("abc3d"))
    assert(row != null && row.isNullAt(4) && row.getInt(2) === 3)
  }

  test("codegen matcher reuse: many-row DataFrame matches per-row interpreted kernel") {
    import spark.implicits._
    val texts = (0 until 512).map {
      case i if i % 7 == 0 => s"?raw? junk $i"
      case i if i % 5 == 0 => s"[WARN] tool=grep dur=${i}ms status=err café $i"
      case i => s"[INFO] tool=bash dur=${i}ms status=ok payload $i"
    }
    val got = texts.toDF("text")
      .select(GrokExtract.grok_extract(col("text"), GrokParser.Pattern).as("g"))
      .selectExpr("g.level", "g.tool", "g.dur_ms", "g.status", "g.payload")
      .collect()
    texts.zip(got).foreach { case (t, r) =>
      val exp = kernel(UTF8String.fromString(t))
      if (exp == null) assert((0 until 5).forall(r.isNullAt), s"row not null for: $t")
      else {
        assert(r.getString(0) === exp(0).toString && r.getString(1) === exp(1).toString
          && r.getInt(2) === exp(2) && r.getString(3) === exp(3).toString
          && r.getString(4) === exp(4).toString, s"diverged on: $t")
      }
    }
  }
}
