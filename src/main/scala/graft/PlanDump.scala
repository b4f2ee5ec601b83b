package graft

import java.nio.file.{Files, Paths}

/** Dev/measurement main (optimization rounds): dumps
  * `explain("formatted")` for each bench query to one text file per query,
  * so plan shapes (Exchange count, join strategy, PushedFilters,
  * ReadSchema, WholeStageCodegen spans) can be diffed before/after an
  * optimization without re-running Spark by hand.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [comma-list of names]
  * Dumps the BENCH form of each query (presentation sort stripped) — the
  * form whose cost the driver measures.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    System.setProperty("spark.log.level", "ERROR")
    val sfDir = args(0)
    val outDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.build(s"local[$cpus]", cpus, "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val only = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
    else sys.env.get("SPARK_GRAFT_PLAN_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.benchQueries.filter(kv => names(kv._1))
      case None        => SparkEntry.benchQueries
    }
    // SPARK_GRAFT_PLAN_EXECUTED=1: run the query through the noop sink
    // and dump the WRITE's OWN executed plan — with AQE on, that is the
    // final re-optimized plan (materialized query stages, reused stages,
    // AQEShuffleRead, runtime join rewrites), which the static explain
    // cannot show. The write creates its own QueryExecution, so the plan
    // must be captured from a QueryExecutionListener, not from the
    // read-side df.queryExecution (whose AdaptiveSparkPlan never
    // executes and stays isFinalPlan=false).
    val executed = sys.env.get("SPARK_GRAFT_PLAN_EXECUTED").contains("1")
    @volatile var lastPlan: String = ""
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        lastPlan = qe.executedPlan.toString
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    if (executed) spark.listenerManager.register(listener)
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = if (executed) {
          lastPlan = ""
          df.write.format("noop").mode("overwrite").save()
          // listener delivery is asynchronous AND earlier fixture
          // executions may still be in flight: wait until the stream of
          // onSuccess events has been quiet for a beat, then take the
          // LAST delivered plan (events are delivered in order, so that
          // is the noop write's own execution)
          var waited = 0
          var seen = lastPlan
          var stable = 0
          while ((lastPlan.isEmpty || stable < 6) && waited < 200) {
            Thread.sleep(50); waited += 1
            if (lastPlan == seen && lastPlan.nonEmpty) stable += 1
            else { seen = lastPlan; stable = 0 }
          }
          lastPlan
        } else
          // queryExecution.explainString gives the same text explain()
          // prints, without capturing stdout
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
