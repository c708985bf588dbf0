package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native Catalyst expression: content-defined chunking of a binary
  * payload into an `array<bigint>` of chunk fingerprints.
  *
  * Boundaries come from a polynomial ROLLING hash over a 16-byte window
  * (cut when the low [[CdcChunks.MaskBits]] bits are zero → expected chunk
  * ~64 bytes, clamped to [32, 256]) — the classic CDC construction
  * (rsync/LBFS family): because the boundary depends only on LOCAL bytes,
  * inserting or deleting a prefix shifts every offset but re-synchronizes
  * the cut points, so unchanged content keeps producing the SAME chunks.
  * That is the property byte-offset (fixed-size) chunking lacks and what
  * makes shared-boilerplate detection across shifted documents work. Each
  * chunk is fingerprinted with FNV-1a 64.
  *
  * Scale shape: one tight per-row byte loop inside codegen (delegated to
  * [[CdcChunks.compute]] — a straight-line JVM method, no interpreter, no
  * per-element boxing); the chunking is map-side, and the downstream dedup
  * is an equi-join/aggregation on the 64-bit fingerprints.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cdc_chunks expects binary, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcChunks.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  /** Rolling-hash window (bytes). */
  val Window = 16
  /** Boundary when the low MaskBits of the rolling hash are zero →
    * expected chunk length 2^MaskBits = 64 bytes. */
  val MaskBits = 6
  /** Chunk length clamps: no boundary before Min, forced cut at Max. */
  val MinChunk = 32
  val MaxChunk = 256

  private val Mask = (1L << MaskBits) - 1
  private val Mult = 0x100000001b3L // FNV-64 prime doubles as the rolling multiplier
  /** Mult^(Window-1) mod 2^64, for removing the outgoing byte. */
  private val MultOut: Long = {
    var m = 1L
    var i = 0
    while (i < Window - 1) { m *= Mult; i += 1 }
    m
  }

  /** Chunk (offset, length, fingerprint) triples — the spec-visible form;
    * the expression ships only the fingerprints. */
  def chunkBounds(bytes: Array[Byte]): Seq[(Int, Int, Long)] = {
    val out = Seq.newBuilder[(Int, Int, Long)]
    var start = 0
    var roll = 0L
    var i = 0
    while (i < bytes.length) {
      roll = roll * Mult + (bytes(i) & 0xff)
      if (i - start >= Window) roll -= (bytes(i - Window) & 0xff) * MultOut * Mult
      val len = i - start + 1
      if ((len >= MinChunk && (roll & Mask) == 0) || len >= MaxChunk || i == bytes.length - 1) {
        out += ((start, len, fnv1a(bytes, start, len)))
        start = i + 1
        roll = 0L
      }
      i += 1
    }
    out.result()
  }

  /** FNV-1a 64 over bytes [off, off+len). */
  private def fnv1a(bytes: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = off
    val end = off + len
    while (i < end) {
      h ^= (bytes(i) & 0xff)
      h *= Mult
      i += 1
    }
    h
  }

  /** Codegen entry point: the chunk fingerprints as Catalyst array data. */
  def compute(bytes: Array[Byte]): ArrayData = {
    val chunks = chunkBounds(bytes)
    val arr = new Array[Long](chunks.length)
    var i = 0
    chunks.foreach { c => arr(i) = c._3; i += 1 }
    new GenericArrayData(arr)
  }
}
