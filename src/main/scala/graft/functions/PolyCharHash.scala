package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash over a string's
  * byte stream, `acc = (acc * base + byte) % mod`, in one fused codegen'd
  * loop.
  *
  * Two modes:
  *  - `padTo > 0`: fold exactly `padTo` positions — bytes beyond the
  *    string's length read as 0x20 (space), longer strings truncate. This
  *    is bit-equal to the `rpad(s, padTo, ' ')` + per-position
  *    substr/ascii/pmod chain it replaces (SimHash's token hash), which
  *    was codegen'd but 2×16 expression nodes per token.
  *  - `padTo < 0`: fold the whole string (the content fingerprint /
  *    multimodal checksum fold).
  *
  * ASCII contract: the fold reads BYTES; `ascii()`/`charAt` semantics
  * coincide on the ASCII corpus (documented in SURVEY §5), and the DuckDB
  * oracles spell the identical arithmetic, so hash parity holds
  * end-to-end. Null propagates (UnaryExpression null handling).
  */
case class PolyCharHash(child: Expression, base: Long, mod: Long, padTo: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "poly_char_hash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    PolyCharHash.fold(input.asInstanceOf[UTF8String], base, mod, padTo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyCharHash.fold($c, ${base}L, ${mod}L, $padTo)")

  override protected def withNewChildInternal(
      newChild: Expression): PolyCharHash = copy(child = newChild)
}

object PolyCharHash {
  /** Static fold shared by codegen and any Scala-side caller; the JIT
    * inlines this tight loop (one call per row beats 32+ generated
    * expression nodes both in code size and in compile time).
    */
  def fold(s: UTF8String, base: Long, mod: Long, padTo: Int): Long = {
    val nb    = s.numBytes()
    val limit = if (padTo < 0) nb else padTo
    var acc = 0L
    var i   = 0
    while (i < limit) {
      val c = if (i < nb) (s.getByte(i) & 0xff).toLong else 32L
      acc = (acc * base + c) % mod
      i += 1
    }
    acc
  }
}
