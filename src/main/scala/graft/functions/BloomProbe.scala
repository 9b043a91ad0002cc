package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Codegen expression `bloom_might_contain_any(bloomBytes, keys)` — true iff
  * ANY of the fixed `keys` might be in the serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] of this row.
  *
  * The executor-side half of the manifest probe: one row per FILE (the
  * Iceberg-manifest granularity), so the per-row filter deserialization is
  * exactly the work the driver-side [[graft.layout.BloomIndex.selectFiles]]
  * loop does per file — moved off the driver so the manifest's multi-KB
  * bloom payloads never collect ([[graft.layout.BloomIndex]] header: 100 k
  * files ≈ 120 GB of blooms). Probing mirrors [[BloomAgg.update]]'s hashing
  * (UTF-8 bytes for strings, raw long for integrals) via
  * [[BloomAgg.mightContainAny]]; short-circuits on the first firing key. */
case class BloomMightContainAny(child: Expression, keys: Seq[Any])
  extends UnaryExpression {
  require(keys.nonEmpty, "give at least one lookup key")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_any requires binary, got $other")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_any"

  @transient private lazy val keysArr: Array[Any] = keys.toArray

  override def nullSafeEval(v: Any): Any =
    BloomAgg.mightContainAny(v.asInstanceOf[Array[Byte]], keysArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("keys", keysArr, "java.lang.Object[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomAgg.mightContainAny($c, $keysRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainAny =
    copy(child = newChild)
}

object BloomProbeFunctions {
  def bloom_might_contain_any(bloom: Column, keys: Seq[Any]): Column =
    Bridge.column(BloomMightContainAny(Bridge.expression(bloom), keys))
}
