package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `misra_gries(col, k)` — the classic bounded-memory frequent-items
  * summary: at most k−1 counters whatever the input size, with the
  * guarantee that EVERY item whose true count exceeds n/k is present, and
  * each reported count is a lower bound within n/k of truth (Misra–Gries
  * 1982; merge rule per Agarwal et al., "Mergeable Summaries", PODS'12:
  * sum counters, subtract the k-th largest, drop non-positives — the
  * error budgets ADD, so map-side partials merge without losing the
  * guarantee).
  *
  * This is the 100 TB shape for "what are the hot keys": an exact groupBy
  * shuffles every distinct key; this summary rides the SAME hash-aggregate
  * as a sum — O(k) state per partial, one tiny map per group at the
  * reduce — and [[graft.agg.HeavyHitters]] turns it into an EXACT answer
  * with one candidate-only second pass.
  *
  * Output: map item → lower-bound count (candidate set; counts are
  * order-dependent across reshuffles — the GUARANTEED part, which
  * downstream exact counting relies on, is membership). String inputs
  * only (hash the composite first if needed); NULLs are skipped. */
case class MisraGries(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= 100000, s"k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string column, got $other")
  }

  override def dataType: DataType = MapType(StringType, LongType, false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString // copy out of any reused buffer
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < k - 1 => buf.update(s, 1L)
        case None =>
          // decrement-all: amortized O(1) per deletion (each decrement is
          // funded by a prior increment)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size >= k) {
      // subtract the k-th largest count; at most k-1 survive
      val cut = a.values.toArray.sortInPlaceWith(_ > _).apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic layout (sorted by item) so the VALUE is stable given
    // the same summary content
    val entries = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)): Array[Any]),
      new GenericArrayData(entries.map(_._2): Array[Any]))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      // length-prefixed raw UTF-8, not writeUTF: items are arbitrary
      // column values and writeUTF throws past 64 KB
      val b = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    (1 to n).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  def misraGries(c: Column, k: Int): Column =
    Bridge.column(
      MisraGries(Bridge.expression(c), k).toAggregateExpression())
}
