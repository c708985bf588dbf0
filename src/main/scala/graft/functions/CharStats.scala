package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document CHARACTER statistics
  * `(n_chars, n_alpha, n_space, n_uniq, ent_q)` in ONE map-side pass —
  * the character-level half of the Gopher/FineWeb quality battery, next
  * to `gram_stats`' token-level half.
  *
  * The dataflow formulation (explode characters → count per (doc, char)
  * → roll up) ships every character of the corpus through two
  * aggregation exchanges; the statistics are PER DOCUMENT and a document
  * always fits in a task, so the computation belongs in a projection
  * next to the scan — zero shuffles at any scale.
  *
  * `ent_q` carries the character-entropy numerator under the same
  * cross-engine float contract `text_perplexity` proved out (SURVEY §5):
  * per-distinct-character surprisal `ln(n/c)` is quantized ONCE to 1e-4
  * nats (`floor(ln(n/c)*1e4 + 0.5)`, `StrictMath.log` — the function
  * Spark's own `ln` evaluates), then `ent_q = Σ c_i * q_i` is exact
  * BIGINT; the caller performs one final double division that DuckDB
  * replays identically. Counting is by Unicode code point (what DuckDB's
  * `string_split(text, '')`/`length()` count).
  */
case class CharStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_stats expects string, got $t")
  }

  override def dataType: DataType = CharStats.schema
  override def prettyName: String = "char_stats"

  override protected def nullSafeEval(input: Any): Any =
    CharStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CharStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

object CharStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_space", LongType, nullable = false),
    StructField("n_uniq", LongType, nullable = false),
    StructField("ent_q", LongType, nullable = false)))

  /** One pass over the code points: class counts + per-distinct-character
    * counts, then the quantized-surprisal sum. ASCII rides an
    * allocation-free `long[128]` table (the whole driver corpus, and the
    * overwhelming bulk of real text); only supplementary code points fall
    * back to a boxed map — this sits in the hottest map-side loop of the
    * expression, so per-character allocation is what the fast path buys
    * off. */
  def compute(input: UTF8String): InternalRow = {
    val s = input.toString
    val ascii = new Array[Long](128)
    var wide: java.util.HashMap[Integer, Long] = null
    var nChars = 0L
    var nAlpha = 0L
    var nSpace = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      nChars += 1
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) nAlpha += 1
      else if (cp == ' ') nSpace += 1
      if (cp < 128) ascii(cp) += 1L
      else {
        if (wide == null) wide = new java.util.HashMap[Integer, Long]()
        wide.merge(cp, 1L, (x, y) => x + y)
      }
    }
    if (nChars == 0L) return InternalRow(0L, 0L, 0L, 0L, 0L)
    var entQ = 0L
    var nUniq = 0L
    // surprisal of each distinct character in 1e-4-nat units — quantized
    // ONCE, exact integer arithmetic from here on (the perplexity contract)
    @inline def add(c: Long): Unit = if (c > 0L) {
      nUniq += 1L
      val q = math.floor(StrictMath.log(nChars.toDouble / c.toDouble) * 10000d + 0.5).toLong
      entQ += c * q
    }
    i = 0
    while (i < 128) { add(ascii(i)); i += 1 }
    if (wide != null) {
      val it = wide.values().iterator()
      while (it.hasNext) add(it.next())
    }
    InternalRow(nChars, nAlpha, nSpace, nUniq, entQ)
  }
}
