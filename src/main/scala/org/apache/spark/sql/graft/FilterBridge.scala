package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.Filter

/** Bridge to Spark's `private[sql]` catalyst-expression → data-source
  * Filter translation — the SAME translation the planner applies for
  * scan pushdown, reused so utility-surface row-level operations
  * (deleteFromLog and friends, whose predicate arrives as a Column,
  * not through a ScanBuilder) can prune candidate files against the
  * manifest statistics with identical semantics. Lives inside the
  * org.apache.spark.sql package tree solely for access.
  */
object FilterBridge {
  def translate(e: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(e,
      supportNestedPredicatePushdown = true)
}
