package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Dev-only stage profiler for q_triangles: times each sub-frame of the
  * wedge-closing plan in isolation to locate the dominant cost.
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus, "graft-triprobe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.GraphOps
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tri] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("edgeTable build+full query") {
      GraphOps.triangles(spark, sfDir).count()
    }
    val edir = graft.sources.SetupOnce.runtimeDir(sfDir, "copurchase_edges")
    val edges = spark.read.parquet(edir)
    println(s"[tri] directed edges = ${edges.count()}")

    val und = edges.filter(col("p1") < col("p2"))
    val deg = edges.groupBy(col("p1").as("pk"))
      .agg(count(lit(1)).as("deg"))
    def ordLt(d1: Column, k1: Column, d2: Column, k2: Column): Column =
      (d1 < d2) || (d1 === d2 && k1 < k2)
    def ori: DataFrame = und
      .join(deg.select(col("pk").as("p1"), col("deg").as("deg1")), Seq("p1"))
      .join(deg.select(col("pk").as("p2"), col("deg").as("deg2")), Seq("p2"))
      .select(
        when(ordLt(col("deg1"), col("p1"), col("deg2"), col("p2")),
          col("p1")).otherwise(col("p2")).as("src"),
        when(ordLt(col("deg1"), col("p1"), col("deg2"), col("p2")),
          col("p2")).otherwise(col("p1")).as("dst"),
        when(ordLt(col("deg1"), col("p1"), col("deg2"), col("p2")),
          col("deg2")).otherwise(col("deg1")).as("ddst"))
    (1 to 2).foreach { i =>
      time(s"orientation (ori.count) run$i") { println("  n=" + ori.count()) }
    }
    def wedges: DataFrame = {
      val o = ori
      val e1 = o.select(col("src"), col("dst").as("b"), col("ddst").as("db"))
      val e2 = o.select(col("src"), col("dst").as("c"), col("ddst").as("dc"))
      e1.join(e2, Seq("src"))
        .filter(ordLt(col("db"), col("b"), col("dc"), col("c")))
        .select(col("src").as("a"), col("b"), col("c"))
    }
    (1 to 2).foreach { i =>
      time(s"wedge generation run$i") { println("  n=" + wedges.count()) }
    }
    def trisPair: DataFrame = {
      val closing = ori.select(col("dst").as("c"), col("src").as("b"))
      wedges.join(broadcast(closing), Seq("b", "c"))
    }
    (1 to 2).foreach { i =>
      time(s"pair-key closing join run$i") {
        println("  n=" + trisPair.count()) }
    }
    def wedgesPacked: DataFrame = {
      val o = ori
      val e1 = o.select(col("src"), col("dst").as("b"), col("ddst").as("db"))
      val e2 = o.select(col("src"), col("dst").as("c"), col("ddst").as("dc"))
      e1.join(e2, Seq("src"))
        .filter(ordLt(col("db"), col("b"), col("dc"), col("c")))
        .select(col("src").as("a"), col("b"), col("c"),
          (shiftleft(col("b"), 32) + col("c")).as("bc"))
    }
    def trisPacked: DataFrame = {
      val closing = ori.select(
        (shiftleft(col("src"), 32) + col("dst")).as("bc"))
      wedgesPacked.join(broadcast(closing), Seq("bc"))
    }
    (1 to 2).foreach { i =>
      time(s"packed-key closing join run$i") {
        println("  n=" + trisPacked.count()) }
    }
    (1 to 2).foreach { i =>
      time(s"full packed pipeline run$i") {
        val perNode = trisPacked
          .select(explode(array(col("a"), col("b"), col("c"))).as("pk"))
          .groupBy(col("pk")).agg(count(lit(1)).as("n_tri"))
        println("  n=" + perNode.count())
      }
    }
    spark.stop()
  }
}
