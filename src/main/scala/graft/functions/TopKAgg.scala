package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: per group, keep the k best `(ord, id)` pairs —
  * best = largest `ord`, ties to the smallest `id` — in a k-element binary
  * heap, and emit them best-first as `array<struct<ord,id>>`.
  *
  * This is the scale-correct form of "top-k per group". The window
  * formulation (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`)
  * shuffles EVERY input row to its group's partition and sorts the whole
  * group, so its shuffle volume is the full table and its memory is the
  * largest group. This aggregate rides the ObjectHashAggregate path the
  * same way `collect_list`/`percentile` do, but with a bound: map-side
  * partial aggregation reduces each partition to ≤ k pairs per group
  * BEFORE the exchange, so the shuffle carries at most k·partitions rows
  * per group and post-shuffle memory is exactly one k-heap per group —
  * at 100 TB, top-3-per-category shuffles kilobytes where the window form
  * shuffles the table. (Spark's own TakeOrderedAndProject does this for
  * the GLOBAL top-k; there is no grouped equivalent in the box.)
  *
  * Null semantics match SQL aggregates: rows where either child is null
  * are ignored. Groups with no valid rows yield an empty array.
  */
case class TopKPairs(
    ordExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  require(k > 0, s"top_k_pairs requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(ordExpr, idExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = TopKPairs.resultType

  override def prettyName: String = "top_k_pairs"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ordExpr.dataType == LongType && idExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"(${ordExpr.dataType.catalogString}, ${idExpr.dataType.catalogString})")

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(TopKPairs.WorstFirst)

  private def offer(
      heap: mutable.PriorityQueue[(Long, Long)],
      p: (Long, Long)): Unit =
    if (heap.size < k) heap.enqueue(p)
    else if (TopKPairs.WorstFirst.compare(p, heap.head) < 0) {
      // p is strictly better than the current worst — evict it
      heap.dequeue(); heap.enqueue(p)
    }

  override def update(
      heap: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val ord = ordExpr.eval(input)
    val id = idExpr.eval(input)
    if (ord != null && id != null)
      offer(heap, (ord.asInstanceOf[Long], id.asInstanceOf[Long]))
    heap
  }

  override def merge(
      heap: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)])
      : mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(offer(heap, _))
    heap
  }

  override def eval(heap: mutable.PriorityQueue[(Long, Long)]): Any = {
    // ascending by "worseness" = best-first (WorstFirst ranks worse greater)
    val best = heap.toArray.sorted(TopKPairs.WorstFirst)
    new GenericArrayData(best.map(p => InternalRow(p._1, p._2)))
  }

  override def serialize(
      heap: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 16 * heap.size)
    buf.putInt(heap.size)
    heap.foreach { case (ord, id) => buf.putLong(ord); buf.putLong(id) }
    buf.array()
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val buf = ByteBuffer.wrap(bytes)
    val heap = createAggregationBuffer()
    val n = buf.getInt
    var i = 0
    while (i < n) { heap.enqueue((buf.getLong, buf.getLong)); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(ordExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKPairs {
  /** `PriorityQueue.head` must be the WORST kept pair (the eviction
    * candidate), so this ordering ranks "worse" as "greater": smaller
    * `ord` is worse; on ties the larger `id` is worse (the kept order
    * breaks ties toward small ids). Comparisons avoid negation so
    * `Long.MinValue` ords are handled.
    */
  private[functions] object WorstFirst extends Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  /** Column-API entry: `top_k_pairs(ord, id, k)` as an aggregate Column. */
  def topKPairs(ord: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKPairs(
        ColumnBridge.expression(ord),
        ColumnBridge.expression(id), k).toAggregateExpression())

  /** Unpacks an aggregated `top` array into ranked rows: one row per kept
    * pair, rank = 1-based position (the array is emitted best-first), the
    * struct fields renamed to caller vocabulary. ONE definition of the
    * posexplode idiom so the struct layout in [[resultType]] has a single
    * consumer to stay in sync with.
    */
  def explodeRanked(
      agged: org.apache.spark.sql.DataFrame,
      keep: Seq[String], idName: String, ordName: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, posexplode}
    agged
      .select(keep.map(col) :+ posexplode(col("top")): _*)
      .select(keep.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as(idName),
        col("col.ord").as(ordName)): _*)
  }
}
