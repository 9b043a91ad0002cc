package graft.tools

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** In-JVM interleaved microbench of the grok kernel: the round-7
  * reused-matcher + ASCII-byte-slice formulation ([[graft.parse.GrokImpl]])
  * vs the round-1 per-row String formulation (reproduced verbatim below) —
  * one JIT session, alternating batches, medians printed. Exists because the
  * sandbox's co-tenant noise (±8 % stage-CPU swing between same-code e2e
  * reps) swallows a single-digit map-stage win; a same-JVM interleave is the
  * only instrument on this box with that resolution. Diagnostic only.
  *
  * Usage: graft.tools.GrokBench [rows-per-batch] [batches]
  */
object GrokBench {

  /** The pre-round-7 body, verbatim (fresh matcher, String groups). */
  private def oldExtract(p: Pattern, s: UTF8String): InternalRow = {
    val m = p.matcher(s.toString)
    if (!m.matches()) return null
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

  def main(args: Array[String]): Unit = {
    val perBatch = args.lift(0).map(_.toInt).getOrElse(2000000)
    val batches = args.lift(1).map(_.toInt).getOrElse(7)
    val pat = Pattern.compile(graft.parse.GrokParser.Pattern)
    val matcher = pat.matcher("")
    // the e2e fixture's text shape: ~95 % well-formed, 5 % quarantine rows
    val texts: Array[UTF8String] = (0 until 4096).map { i =>
      if (i % 20 == 0) UTF8String.fromString(s"?raw? malformed line $i")
      else UTF8String.fromString(
        s"[INFO] tool=bash dur=${i % 5000}ms status=ok tokens of a payload line $i")
    }.toArray
    var sink = 0L // defeat dead-code elimination
    def runOld(): Double = {
      val t0 = System.nanoTime(); var i = 0
      while (i < perBatch) {
        val r = oldExtract(pat, texts(i & 4095)); if (r != null) sink += r.getInt(2); i += 1
      }
      (System.nanoTime() - t0).toDouble / perBatch
    }
    def runNew(): Double = {
      val t0 = System.nanoTime(); var i = 0
      while (i < perBatch) {
        val r = graft.parse.GrokImpl.extract(matcher, texts(i & 4095))
        if (r != null) sink += r.getInt(2); i += 1
      }
      (System.nanoTime() - t0).toDouble / perBatch
    }
    // warm both paths into the same JIT session
    (1 to 3).foreach { _ => runOld(); runNew() }
    val olds = collection.mutable.ArrayBuffer[Double]()
    val news = collection.mutable.ArrayBuffer[Double]()
    (1 to batches).foreach { _ => olds += runOld(); news += runNew() }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"GROKBENCH old=${med(olds.toSeq)}%.1f ns/row new=${med(news.toSeq)}%.1f ns/row " +
      f"(olds=${olds.map(x => f"$x%.0f").mkString(",")} news=${news.map(x => f"$x%.0f").mkString(",")} sink=$sink)")
  }
}
