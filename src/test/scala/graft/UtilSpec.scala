package graft

import org.apache.spark.sql.functions._

import graft.sources.SetupOnce

/** Direct coverage for the runtime-layout utilities the operators lean on:
  * the write-once guard, the collision-proof fixture paths, and both sides
  * of the spread guard's size threshold.
  */
class UtilSpec extends SparkSpecBase {

  test("SetupOnce runs a keyed write exactly once per JVM") {
    var runs = 0
    val key = s"utilspec-${System.nanoTime()}"
    SetupOnce(key) { runs += 1 }
    SetupOnce(key) { runs += 1 }
    assert(runs == 1)
    SetupOnce(key + "-other") { runs += 1 }
    assert(runs == 2)
  }

  test("runtimeDir separates same-named datasets and embeds this JVM") {
    val a = SetupOnce.runtimeDir("/root/testdata/sf0.001", "x")
    val b = SetupOnce.runtimeDir("/tmp", "x")
    assert(a != b)
    val pid = ProcessHandle.current().pid().toString
    assert(a.contains(pid) && b.contains(pid),
      "fixture dirs must be process-private")
  }

  test("spread engages under the one-split threshold, skips above it") {
    val par = spark.sparkContext.defaultParallelism
    // tiny: single-split local parquet — must fan out to the session width
    val tiny = Tables.lineitem(spark, sfDir)
    assert(Tables.spread(tiny, col("l_orderkey"))
      .rdd.getNumPartitions == par)
    // big: range stats are 8 bytes/row, so 32M rows ≈ 256 MB > threshold —
    // must come back untouched (identity, no exchange added)
    val big = spark.range(32L << 20).select(col("id"))
    assert(Tables.spread(big, col("id")) eq big)
  }
}
