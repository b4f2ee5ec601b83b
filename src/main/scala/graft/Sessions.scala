package graft

import org.apache.spark.sql.SparkSession

/** The one place the engine's session knobs live — Bench, Verify, the dev
  * mains, and the test base all build through here so the configuration
  * (extensions registration included) cannot drift.
  */
object Sessions {
  def build(master: String, shufflePartitions: String,
      appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // inferred isnotnull constraints re-evaluate expensive computed
      // expressions (shingle chains) at the scans; every graft query
      // carries its filters explicitly, so inference only costs
      .config("spark.sql.constraintPropagation.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      // per-JVM warehouse: bucketed-table dirs are session-scoped anyway
      // (in-memory catalog), and a shared path would let concurrent JVMs
      // delete each other's table directories mid-read
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
