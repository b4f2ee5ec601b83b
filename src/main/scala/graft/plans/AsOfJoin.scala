package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Whole-operator extension tier: a native backward AS-OF join as a
  * custom `LogicalPlan` + planner `Strategy` + `SparkPlan` — the (c)
  * option of the extension ladder, used when composition genuinely
  * cannot express the OPERATOR (the merge-scan composition in
  * [[graft.operators.EventOps.asofJoin]] expresses the same RESULT, but
  * only by materializing a union'd timeline with per-row null padding
  * and a window pass over it; the native operator streams both sorted
  * sides once with zero extra columns). Registered through
  * [[GraftExtensions]]; constructed from public DataFrames via
  * [[AsOfJoin.apply]].
  *
  * Semantics (matching the composed form and the DuckDB oracle): LEFT
  * OUTER — for every left row, the single right row with the same key
  * whose time is the greatest `rightTime <= leftTime`; equal times
  * resolve to the greatest `tieBreak`; left rows with no qualifying
  * right row emit nulls for the right side. NULL keys or times never
  * match (SQL comparison semantics).
  */
object AsOfJoin {

  /** Build the as-of join over public DataFrames. Column names are
    * resolved against each side; the right side's columns must be
    * disjointly named from the left's (pre-project/rename — the output
    * is left.output ++ right.output).
    */
  def apply(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      tieBreak: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // Self-as-of-join guard: when both sides derive from the same base
    // relation the analyzed plans share attribute IDs, and a binary node
    // carrying duplicate IDs mis-binds columns (the same hazard Spark's
    // own Join solves with DeduplicateRelations). Re-alias the right
    // side behind fresh exprIds whenever the outputs overlap.
    val rPlan: LogicalPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).nonEmpty)
        Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
      else rPlan0
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$name' in ${p.output.map(_.name).mkString(", ")}"))
    val node = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      attr(rPlan, tieBreak))
    org.apache.spark.sql.graft.PlanBridge.ofRows(left.sparkSession, node)
  }
}

case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tieBreak: Expression) extends BinaryNode {
  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of times must be epoch-long columns")
  require(leftKey.dataType == rightKey.dataType,
    "as-of keys must share a type")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for the graft logical nodes. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of merge join.
  *
  * Distribution: both children hash-cluster on the key at the FIXED
  * session shuffle-partition count (`requiredNumPartitions` pins the two
  * exchanges to identical counts so the per-partition zip below is
  * always key-aligned — AQE may not coalesce the two sides of an
  * operator it does not know about coherently, so the pin trades its
  * coalescing for correctness-by-construction). Ordering: left by
  * (key, time), right by (key, time, tieBreak) — EnsureRequirements
  * inserts the exchanges/sorts exactly as it does for sort-merge join.
  *
  * Execution is ONE forward merge pass per partition: the right cursor
  * never rewinds, the only buffered state is the single last-qualifying
  * right row (copied), and output rows stream as (left ++ matched|null).
  * At 100 TB that is the minimal possible data movement for a
  * non-equi-bounded join: one shuffle per side, zero row expansion, no
  * timeline union, no window state.
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tieBreak: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(leftKey :: Nil, requiredNumPartitions = n) ::
      ClusteredDistribution(rightKey :: Nil, requiredNumPartitions = n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(tieBreak, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyE  = BindReferences.bindReference(leftKey, lOut)
    val rKeyE  = BindReferences.bindReference(rightKey, rOut)
    val lTimeE = BindReferences.bindReference(leftTime, lOut)
    val rTimeE = BindReferences.bindReference(rightTime, rOut)
    val keyType = leftKey.dataType
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      var curRight: InternalRow = if (rIt.hasNext) rIt.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null
      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIt.hasNext
        override def next(): InternalRow = {
          val l = lIt.next()
          val lKey  = lKeyE.eval(l)
          val lTime = lTimeE.eval(l)
          if (lKey == null || lTime == null) {
            // NULL never matches; NULL keys sort first so no skipping
            // is needed before real keys arrive
            toUnsafe(joined(l, nullRight))
          } else {
            val lt = lTime.asInstanceOf[Long]
            var advancing = true
            while (advancing && curRight != null) {
              val rKey = rKeyE.eval(curRight)
              if (rKey == null) { curRight = nextRight() } // sorts first
              else {
                val c = keyOrd.compare(rKey, lKey)
                if (c < 0) curRight = nextRight()
                else if (c == 0) {
                  val rTime = rTimeE.eval(curRight)
                  if (rTime == null) curRight = nextRight() // never matches
                  else if (rTime.asInstanceOf[Long] <= lt) {
                    // qualifying; sorted (time, tieBreak) asc => the
                    // LAST one buffered is the as-of winner. Copy the
                    // KEY as well as the row: for non-primitive keys
                    // (UTF8String/binary/decimal) eval returns a view
                    // into the sorter's live buffer, which the next
                    // rIt.next() re-points — retaining the raw value
                    // would silently corrupt the match-key compare.
                    lastMatch = curRight.copy()
                    lastMatchKey = InternalRow.copyValue(rKey)
                    curRight = nextRight()
                  } else advancing = false
                } else advancing = false
              }
            }
            val matched = lastMatch != null &&
              keyOrd.compare(lastMatchKey, lKey) == 0
            toUnsafe(joined(l, if (matched) lastMatch else nullRight))
          }
        }
        private def nextRight(): InternalRow =
          if (rIt.hasNext) rIt.next() else null
      }
    }
  }
}
