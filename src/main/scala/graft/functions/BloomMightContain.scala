package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: membership probe of a BROADCAST
  * `util.sketch.BloomFilter` on a BIGINT key.
  *
  * Used by the decontamination prefilter (graft.operators.Pipeline): at
  * 100 TB every exploded (doc, shingle) pair passes this predicate
  * map-side, so it must stay inside whole-stage codegen — the Scala-UDF
  * rendition it replaces paid per-row boxing AND broke codegen for the
  * surrounding stage. Same shape as Spark's internal
  * `BloomFilterMightContain` (runtime row-level filtering), except the
  * filter arrives through a `Broadcast` handle instead of a plan-embedded
  * literal: the bit array ships once per executor via the broadcast
  * machinery and never appears in the plan string.
  *
  * The broadcast handle is a constructor parameter, not a child
  * expression, so the predicate cannot be built from SQL text — build the
  * `Column` with [[BloomMightContain.mightContain]].
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects bigint, got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom, classOf[Broadcast[_]].getName)
    // resolve the broadcast ONCE per codegen instance, not per row
    val filterVar = ctx.addMutableState(bfClass, "graftBloomFilter",
      v => s"$v = ($bfClass) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $filterVar.mightContainLong($v);")
  }

  // keep the broadcast handle out of the plan/tree string (it would print
  // as an opaque Broadcast(id) — noise next to the key expression)
  override def toString: String = s"bloom_might_contain($child)"

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-level entry point: `df.filter(mightContain(col("sh"), bc))`. */
  def mightContain(key: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(key), bloom))
}
