package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native probe into a serialized Count-Min sketch: `cms_estimate(sketch,
  * key)` returns the sketch's estimated occurrence count for `key` — the
  * read side of Spark's `count_min_sketch(...)` aggregate, which produces
  * the binary but ships no way to query it in SQL.
  *
  * The probe hashes the key's UTF-8 bytes, the exact representation the
  * aggregate's update path feeds the sketch (`addBinary` of the
  * UTF8String's bytes), so estimates are bit-faithful to what was counted.
  *
  * Deserializing the sketch is O(depth·width); doing that per probed row
  * would swamp the O(depth) estimate. Probe rows carry the SAME binary
  * (one sketch broadcast against the candidate keys) but each row hands
  * the expression a FRESH copy of it (UnsafeRow.getBinary copies), so the
  * per-thread last-sketch cache compares CONTENT (length + Arrays.equals
  * — nanoseconds against the parse it saves), parsing each distinct
  * sketch once per task; no shared mutable state across tasks,
  * deterministic output regardless of cache hits.
  *
  * Codegen'd via a static helper call (the [[PolyCharHash]] pattern), so
  * the expression stays inside whole-stage codegen and passes the
  * CODEGEN_ONLY guard.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    CmsEstimate.estimate(
      sketch.asInstanceOf[Array[Byte]], key.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (sk, k) => s"graft.functions.CmsEstimate.estimate($sk, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  private val lastSketch =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  /** Static probe shared by codegen and interpreted eval. */
  def estimate(bytes: Array[Byte], key: UTF8String): Long = {
    val cached = lastSketch.get()
    val sketch =
      if (cached != null && java.util.Arrays.equals(cached._1, bytes))
        cached._2
      else {
        val parsed = CountMinSketch.readFrom(bytes)
        lastSketch.set((bytes, parsed))
        parsed
      }
    // byte[] probe = the aggregate's addBinary(UTF8String.getBytes) path
    sketch.estimateCount(key.getBytes)
  }

  /** Column-API entry, mirroring [[TopKPairs.topKPairs]]. */
  def probe(sketch: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(CmsEstimate(
      org.apache.spark.sql.graft.ColumnBridge.expression(sketch),
      org.apache.spark.sql.graft.ColumnBridge.expression(key)))
}
