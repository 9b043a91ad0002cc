package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_agg(col, expectedItems, fpp)` — aggregates a column into a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] (Spark's public, stable-format
  * sketch; `BloomFilter.readFrom` on the probe side round-trips it exactly).
  *
  * Why not the built-in `BloomFilterAggregate`? Its build/probe contract is
  * internal (values pre-hashed with a private xxhash64 pass, probes only via
  * `might_contain` over a FOLDABLE bloom) — usable for runtime join filters,
  * but a per-GROUP bloom column (one filter per file for [[graft.layout.BloomIndex]])
  * needs a probe the driver can run per manifest row. The public sketch API
  * gives symmetric `putBinary`/`mightContainBinary` on both sides.
  *
  * Buffer is the live BloomFilter object (typed buffer ⇒ zero per-row
  * serialization; Spark serializes only at partial-aggregate exchange
  * boundaries). `mergeInPlace` is the distributed story: map-side partials
  * per task, one small `(file, bloom)` row per group at the reduce.
  *
  * Strings are hashed from their UTF-8 bytes (`UTF8String.getBytes` ==
  * `String.getBytes(UTF_8)`, the exact bytes `mightContainString` hashes);
  * integral types via `putLong`/`mightContainLong`. NULLs are skipped — a
  * bloom answers `= value` predicates, which never match NULL anyway.
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  require(expectedItems > 0, s"expectedItems out of range: $expectedItems")
  require(fpp > 0.0 && fpp < 1.0, s"fpp out of range: $fpp")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires string/long/int, got $other")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType => buffer.putBinary(v.asInstanceOf[UTF8String].getBytes)
      case LongType => buffer.putLong(v.asInstanceOf[Long])
      case IntegerType => buffer.putLong(v.asInstanceOf[Int].toLong)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    buffer
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

object BloomAgg {
  /** Column-API entry: `bloomAgg($"event_id", 1 << 20, 0.01)`. */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    Bridge.column(
      BloomAgg(Bridge.expression(c), expectedItems, fpp).toAggregateExpression())

  /** Executor-side probe used by [[graft.layout.BloomIndex.selectFilesDistributed]]:
    * deserialize the row's bloom ONCE, short-circuit on the first firing key
    * — the per-row twin of the driver loop in `selectFiles`, same hashing
    * contract as [[BloomAgg.update]]. */
  def mightContainAny(bloomBytes: Array[Byte], keys: Array[Any]): Boolean = {
    val bf = read(bloomBytes)
    var i = 0
    while (i < keys.length) {
      if (mightContain(bf, keys(i))) return true
      i += 1
    }
    false
  }

  /** Deserialize a bloom once; probe it many times with [[mightContain]].
    * Callers probing k keys against one filter must not pay k
    * deserializations of a multi-KB bitset. */
  def read(bloomBytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Driver-side probe of a serialized bloom against a key. Must mirror
    * [[BloomAgg.update]]'s hashing exactly: UTF-8 bytes for strings, raw
    * long for integrals. */
  def mightContain(bloomBytes: Array[Byte], key: Any): Boolean =
    mightContain(read(bloomBytes), key)

  def mightContain(bf: BloomFilter, key: Any): Boolean = {
    key match {
      case s: String => bf.mightContainBinary(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case l: Long => bf.mightContainLong(l)
      case i: Int => bf.mightContainLong(i.toLong)
      case other => throw new IllegalArgumentException(
        s"unsupported bloom probe type: ${other.getClass}")
    }
  }
}
