package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs: small parallelism (tiny data), UTC,
  * AQE left on — the same knobs Verify/Bench use.
  */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpecBase.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkSpecBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // inferred isnotnull constraints re-evaluate expensive computed
      // expressions (shingle chains) at the scans; every graft query
      // carries its filters explicitly, so inference only costs
      .config("spark.sql.constraintPropagation.enabled", false)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
