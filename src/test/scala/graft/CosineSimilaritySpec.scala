package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Ann

/** The native codegen'd cosine expression: FP parity with the declarative
  * formulation, null semantics, SQL registration via GraftExtensions, and
  * type checking.
  */
class CosineSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("native expression is bit-identical to the zip_with/aggregate fold") {
    val e = Tables.embeddings(spark, sfDir).limit(80)
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("e2"))
    val pairs = a.join(b, col("v1") < col("v2"))
      .select(
        VectorFunctions.cosineSim(col("e1"), col("e2")).as("native"),
        VectorFunctions.cosine(col("e1"), col("e2")).as("declarative"))
    // exact equality — both accumulate ascending, left-associated
    assert(pairs.filter(col("native") =!= col("declarative")).count() === 0)
    assert(pairs.count() > 0)
  }

  test("ragged arrays (dimension mismatch) yield null, not a prefix similarity") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosineSim(col("a"), col("b"))).head.isNullAt(0))
  }

  test("null array or null element yields null") {
    val df = Seq(
      (Some(Array(1f, 2f)), None: Option[Array[Float]])
    ).toDF("a", "b")
    val r = df.select(VectorFunctions.cosineSim(col("a"), col("b"))).head
    assert(r.isNullAt(0))
  }

  test("registered in SQL via GraftExtensions: cosine_sim callable from spark.sql") {
    val r = spark.sql(
      """SELECT cosine_sim(array(CAST(3.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(7.5 AS FLOAT), CAST(0.0 AS FLOAT))) AS s"""
        .stripMargin).head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("type check rejects non-float arrays") {
    val ex = intercept[AnalysisException] {
      spark.sql("SELECT cosine_sim(array(1, 2), array(3, 4))").collect()
    }
    assert(ex.getMessage.contains("array<float>"))
  }

  test("brute-force top-k via the native expression matches the kernel-computed sims") {
    // cross-check two independent implementations on overlapping output:
    // bruteForceTopK (native expression) vs embeddingNearDup (scala kernel)
    val brute = Ann.bruteForceTopK(spark, sfDir)
      .select(col("q_id"), col("n_id"), col("sim"))
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, s) => (math.min(q, n), math.max(q, n)) -> s }.toMap
    val kernel = Ann.embeddingNearDup(spark, sfDir)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val overlap = brute.keySet & kernel.keySet
    assert(overlap.forall(k => brute(k) == kernel(k)))
  }
}
