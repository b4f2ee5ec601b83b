package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: stage-by-stage timing of the dedup pipelines. */
object Perf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus, "graft-perf")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = Tables.documents(spark, sfDir)
    time("0 scan only")(docs.write.format("noop").mode("overwrite").save())
    val sh = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), Dedup.shinglesOfTokens(col("toks")).as("sh"))
      .withColumn("n_sh", size(col("sh")).cast("long"))
    time("1 shingling")(sh.write.format("noop").mode("overwrite").save())
    val ex0 = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    ex0.explain()
    time("2a explode only")(ex0.write.format("noop").mode("overwrite").save())
    val ex1 = sh.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("shingle"))
    time("2b explode+n_sh")(ex1.write.format("noop").mode("overwrite").save())
    val idx = ex1.select(col("doc_id"), col("n_sh"), xxhash64(col("shingle")).as("h"))
    time("2c +xxhash64")(idx.write.format("noop").mode("overwrite").save())
    val P = 2147483647L
    val h0 = idx.withColumn("h0", pmod(col("h"), lit(P)))
    val mins = (0 until 64).map { i =>
      min(pmod(col("h0") * lit(i * 2L + 1L) + lit(i * 40503L + 17L), lit(P))).as(s"m$i")
    }
    val sig = h0.groupBy(col("doc_id"), col("n_sh")).agg(mins.head, mins.tail: _*)
    time("3 minhash agg")(sig.write.format("noop").mode("overwrite").save())
    // join volume of the ngram candidate join
    val a = idx.select(col("doc_id").as("d1"), col("n_sh").as("n1"), col("h"))
    val b = idx.select(col("doc_id").as("d2"), col("n_sh").as("n2"), col("h"))
    val joined = a.join(b, a("h") === b("h") && col("d1") < col("d2"))
    time("4 shingle join")(println("  pairs rows: " + joined.count()))
    val agg = joined.groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("common"))
    time("5 join+agg")(agg.write.format("noop").mode("overwrite").save())
    // simhash lanes
    val exploded = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    time("6 token explode")(exploded.write.format("noop").mode("overwrite").save())
    val laneSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"l$i")
    }
    val lanes = exploded.groupBy(col("doc_id")).agg(laneSums.head, laneSums.tail: _*)
    time("7 simhash agg")(lanes.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
