package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: per-document word-n-gram statistics
  * `(n_grams, n_uniq, top_cf)` from an `array<string>` token column, in ONE
  * map-side pass — no explode, no shuffle.
  *
  * The dataflow formulation (explode n-grams → count per (doc, gram) →
  * roll up per doc) ships the entire exploded gram stream through two
  * aggregation exchanges; but the statistics are PER DOCUMENT and a
  * document always fits in a task, so the whole computation belongs
  * map-side next to the scan — the same argument that puts quality
  * scoring and language-ID in a projection. Gram identity is a chained
  * xxhash64 over the token hashes (token boundaries survive, no gram
  * string is materialized); distinct-hash count equals distinct-gram
  * count up to a ~2^-64-per-pair collision, the same accepted trade as
  * the shingle features (and the DuckDB oracle counts real strings, so
  * the driver gate would surface a collision).
  *
  * Codegen: the loop lives in [[GramStats.compute]]; the generated code
  * calls it statically, so the expression composes with whole-stage
  * codegen like any other non-fallback expression.
  */
case class GramStats(child: Expression, gram: Int) extends UnaryExpression {
  require(gram >= 1, "gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"gram_stats expects array<string>, got $t")
  }

  override def dataType: DataType = GramStats.schema
  override def prettyName: String = "gram_stats"

  override protected def nullSafeEval(input: Any): Any =
    GramStats.compute(input.asInstanceOf[ArrayData], gram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GramStats.compute($a, $gram);")

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

object GramStats {
  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_uniq", LongType, nullable = false),
    StructField("top_cf", LongType, nullable = false)))

  /** Token hash for a null array element: `checkInputDataTypes` accepts
    * `containsNull=true` arrays, so a null token must hash to SOMETHING
    * deterministic rather than NPE inside the codegen'd projection. A
    * fixed sentinel treats all nulls as one distinct token value — the
    * same semantics a `coalesce(x, '<null>')` pre-pass would give. */
  private val NullTokenHash = XXH64.hashLong(0x6e756c6cL /* 'null' */, 42L)

  /** One pass: hash each token once, slide the gram window chaining the
    * token hashes, count occurrences in an open hash map. */
  def compute(arr: ArrayData, gram: Int): InternalRow = {
    val n = arr.numElements()
    val count = n - gram + 1
    if (count <= 0) return InternalRow(0L, 0L, 0L)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) th(i) = NullTokenHash
      else {
        val s = arr.getUTF8String(i)
        th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      }
      i += 1
    }
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](count * 2)
    var top = 0L
    i = 0
    while (i < count) {
      var h = th(i)
      var j = 1
      while (j < gram) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      val c = m.merge(h, 1L, (x, y) => x + y)
      if (c > top) top = c
      i += 1
    }
    InternalRow(count.toLong, m.size.toLong, top)
  }
}
