package graft

import org.apache.spark.sql.functions._

/** Dev-only throughput probe: the graftlog DSv2 reader vs the native
  * vectorized parquet reader over the same live file set.
  */
object LogScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus, "graft-logscan")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Maintenance
    val root = Maintenance.txnTableDir(spark, sfDir)
    val conf = spark.sessionState.newHadoopConf()
    val files = graft.sources.GraftLog.dataFiles(conf, root, 2)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scan] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 3).foreach { i =>
      time(s"graftlog full-width agg run$i") {
        println("  n=" + Maintenance.readVersion(spark, root, 2)
          .agg(count(lit(1)), sum(col("o_orderkey")),
            sum(col("o_totalprice"))).head())
      }
      time(s"native  full-width agg run$i") {
        println("  n=" + spark.read.parquet(files: _*)
          .agg(count(lit(1)), sum(col("o_orderkey")),
            sum(col("o_totalprice"))).head())
      }
      time(s"graftlog 1-col filtered run$i") {
        println("  n=" + Maintenance.readVersion(spark, root, 2)
          .filter(col("o_orderkey") % 7 === 0).count())
      }
      time(s"native  1-col filtered run$i") {
        println("  n=" + spark.read.parquet(files: _*)
          .filter(col("o_orderkey") % 7 === 0).count())
      }
    }
    spark.stop()
  }
}
