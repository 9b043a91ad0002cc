package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Kernel for the broadcast as-of join (see graft.temporal.TemporalJoin):
  * binary search over a per-key SORTED snapshot-timestamp array.
  * Top-level object ⇒ static forwarders callable from generated Java. */
object AsofIndexImpl {

  /** Greatest 1-BASED index i with sorted(i) <= ts, or null (boxed) when
    * every element is greater — 1-based so the result feeds `element_at`
    * directly on the parallel values array. O(log n) per probe row. */
  def search(sorted: ArrayData, ts: Long): java.lang.Integer = {
    var lo = 0
    var hi = sorted.numElements() - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (sorted.getLong(mid) <= ts) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans < 0) null else java.lang.Integer.valueOf(ans + 1)
  }
}

/** `asof_index(array<bigint> sortedTs, bigint ts)` → int: 1-based index of
  * the latest snapshot at-or-before `ts` in an ascending-sorted timestamp
  * array, NULL when none qualifies. The compiled binary search that makes
  * the broadcast as-of join O(log S) per probe row instead of the O(S)
  * interpreted `filter(...)` + `element_at(-1)` HOF formulation (higher-order
  * lambdas never enter whole-stage codegen).
  *
  * CONSUMER CONTRACT: this expression is null-INTRODUCING — non-null inputs
  * can produce a null output. Feed it only to consumers whose static
  * nullability accounts for a nullable ordinal: ANSI `element_at`
  * (failOnError=true) does NOT (GetArrayItemUtil's failOnError branch
  * derives nullability from the array alone), so over a non-nullable array
  * it declares the result non-null, codegen skips the index null check, and
  * the ordinal slot's default (-1) selects the last element. Use
  * `try_element_at` (always-nullable) — semantics are identical because the
  * index is valid-or-null by construction. */
case class AsofIndex(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"asof_index requires (array<bigint>, bigint), got ($l, $r)")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "asof_index"

  override def nullSafeEval(arr: Any, ts: Any): Any = {
    val r = AsofIndexImpl.search(arr.asInstanceOf[ArrayData], ts.asInstanceOf[Long])
    if (r == null) null else r.intValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, ts) => {
      val boxed = ctx.freshName("asofIdx")
      s"""
         |java.lang.Integer $boxed = graft.functions.AsofIndexImpl.search($arr, $ts);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AsofIndex =
    copy(left = newLeft, right = newRight)
}

object AsofFunctions {
  def asof_index(sortedTs: Column, ts: Column): Column =
    Bridge.column(AsofIndex(Bridge.expression(sortedTs), Bridge.expression(ts)))
}
