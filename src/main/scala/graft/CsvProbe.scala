package graft
import org.apache.spark.sql.functions._
object CsvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = Sessions.build("local[32]", "32", "probe")
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    import org.apache.spark.sql.graft.PlanBridge.stripPresentationSort
    // warm
    Tables.documents(spark, sfDir).write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { i =>
      time(s"corpus_shards full $i") {
        operators.CorpusPipeline.corpusShards(spark, sfDir)
          .write.format("noop").mode("overwrite").save() }
      time(s"corpus_build (kept gate)  $i") {
        operators.CorpusPipeline.corpusBuild(spark, sfDir)
          .write.format("noop").mode("overwrite").save() }
      time(s"scrub+chunk only (no kept join) $i") {
        val red = Tables.spread(Tables.documents(spark, sfDir), col("doc_id"))
          .select(col("doc_id"), col("lang"),
            functions.TextAnalysis.scrubPii(col("text")).as("text"))
        functions.TextAnalysis.chunkOf(red, Seq("lang"))
          .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
