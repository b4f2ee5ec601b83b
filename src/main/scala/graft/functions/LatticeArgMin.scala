package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Native Catalyst expression: nearest-centroid assignment on the integer
  * lattice — for a quantized vector `q: array<bigint>`, a centroid matrix
  * `cents: array<array<bigint>>` and parallel ids `cids: array<bigint>`,
  * returns `struct(cid: bigint, dist: bigint)` for the centroid minimizing
  * the exact squared Euclidean distance, ties to the LOWEST position
  * (= lowest cid when the matrix is sorted by cid).
  *
  * Why a custom Expression (the [[CosineSimilarity]] rationale, k-fold
  * worse): the same argmin written with built-ins is either a k·dim-term
  * unrolled tree (~3000 nodes for k=8, dim=64 — past the JIT method
  * limits, measured ~350µs/row effectively interpreted) or a higher-order
  * `transform`/`aggregate` fold (CodegenFallback, interpreted per
  * element). This generates ONE fused k×dim loop via `doGenCode`; and
  * because the centroid matrix is a complex-type literal it lands in the
  * codegen REFERENCES, so every Lloyd round reuses the same compiled
  * method instead of forcing a fresh janino compile per new centroids.
  *
  * Arithmetic contract: all differences/products/sums in Java `long` —
  * exact for lattice coordinates up to ~2³¹ per component (quantized
  * embeddings are ~2·10⁴), matching the DuckDB oracle's BIGINT math.
  *
  * Null semantics: any null input or null element → null result (the
  * quantized pipeline never produces one; this mirrors zip_with folds).
  */
case class LatticeArgMin(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _),
            ArrayType(ArrayType(LongType, _), _),
            ArrayType(LongType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<array<bigint>>, " +
        s"array<bigint>), got ${first.dataType.catalogString}, " +
        s"${second.dataType.catalogString}, ${third.dataType.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("dist", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "lattice_argmin"

  override protected def nullSafeEval(q: Any, cents: Any, cids: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val ca = cents.asInstanceOf[ArrayData]
    val ia = cids.asInstanceOf[ArrayData]
    val dim = qa.numElements()
    val k = ca.numElements()
    if (k == 0 || k != ia.numElements()) return null
    var bestDist = Long.MaxValue
    var bestPos = -1
    var c = 0
    while (c < k) {
      if (ca.isNullAt(c)) return null
      val cent = ca.getArray(c)
      if (cent.numElements() != dim) return null
      var acc = 0L
      var i = 0
      while (i < dim) {
        if (qa.isNullAt(i) || cent.isNullAt(i)) return null
        val d = qa.getLong(i) - cent.getLong(i)
        acc += d * d
        i += 1
      }
      if (acc < bestDist) { bestDist = acc; bestPos = c }
      c += 1
    }
    InternalRow(ia.getLong(bestPos), bestDist)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cents, cids) => {
      val dim  = ctx.freshName("dim")
      val k    = ctx.freshName("k")
      val c    = ctx.freshName("c")
      val i    = ctx.freshName("i")
      val acc  = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val cent = ctx.freshName("cent")
      val bd   = ctx.freshName("bestDist")
      val bp   = ctx.freshName("bestPos")
      val bad  = ctx.freshName("bad")
      s"""
         |int $dim = $q.numElements();
         |int $k = $cents.numElements();
         |boolean $bad = ($k == 0 || $k != $cids.numElements());
         |long $bd = Long.MAX_VALUE;
         |int $bp = -1;
         |for (int $c = 0; !$bad && $c < $k; $c++) {
         |  if ($cents.isNullAt($c)) { $bad = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $cent =
         |    $cents.getArray($c);
         |  if ($cent.numElements() != $dim) { $bad = true; break; }
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($q.isNullAt($i) || $cent.isNullAt($i)) { $bad = true; break; }
         |    long $diff = $q.getLong($i) - $cent.getLong($i);
         |    $acc += $diff * $diff;
         |  }
         |  if ($bad) break;
         |  if ($acc < $bd) { $bd = $acc; $bp = $c; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { $cids.getLong($bp), $bd });
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LatticeArgMin =
    copy(first = newFirst, second = newSecond, third = newThird)
}
