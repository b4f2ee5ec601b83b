package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.RefTransforms
import graft.sources.TxnGenerator

/** Generator determinism + reference-faithful distributions, and ScalaCheck
  * properties for the bucketing function (SURVEY.md §5.3).
  */
class GeneratorSpec extends SparkSpecBase {
  import spark.implicits._

  test("generator is deterministic and schema-faithful (9 cols)") {
    val a = TxnGenerator.generate(spark, 200).collect()
    val b = TxnGenerator.generate(spark, 200).collect()
    assert(a.sameElements(b))
    assert(a.length === 200)
    assert(TxnGenerator.generate(spark, 1).columns === Array(
      "transaction_id", "date", "timestamp", "amount", "category",
      "description", "transaction_type", "account", "location"))
  }

  test("amounts respect the reference ranges; split is ~30% income (` s3_uploader.py`:68-75)") {
    val df = TxnGenerator.generate(spark, 2000).cache()
    val income  = df.filter(col("transaction_type") === "income")
    val expense = df.filter(col("transaction_type") === "expense")
    assert(income.filter(col("amount") < 500.0 || col("amount") > 5000.0)
      .count() === 0)
    assert(expense.filter(col("amount") > -10.0 || col("amount") < -500.0)
      .count() === 0)
    val incomeShare = income.count().toDouble / 2000
    assert(incomeShare > 0.25 && incomeShare < 0.35)
    val cats = df.select("category").distinct().as[String].collect().toSet
    assert(cats.subsetOf(
      (TxnGenerator.incomeCategories ++ TxnGenerator.expenseCategories).toSet))
    df.unpersist()
  }

  test("property: bucketing is total over doubles and monotone in |amount|") {
    // ScalaCheck-generated sample, evaluated in one Spark job
    val amounts = Gen.listOfN(400,
      Gen.oneOf(Gen.chooseNum(-1e9, 1e9), Gen.oneOf(
        0.0, 25.0, -25.0, 100.0, -100.0, 500.0, -500.0,
        24.999999, 99.999999, 499.999999)))
      .apply(Gen.Parameters.default, Seed(42L)).get
    val order = Seq("small", "medium", "large", "very_large")
    val out = amounts.toDF("amount")
      .select(col("amount"), RefTransforms.categorizeAmount(col("amount")))
      .as[(Double, String)].collect()
    assert(out.forall { case (_, b) => order.contains(b) }) // total
    val sortedByAbs = out.sortBy { case (a, _) => math.abs(a) }
    val ranks = sortedByAbs.map { case (_, b) => order.indexOf(b) }
    assert(ranks.zip(ranks.tail).forall { case (x, y) => x <= y }) // monotone
  }

  test("property: upsert LWW is idempotent — re-running dedup changes nothing") {
    val base = graft.operators.Relational.upsertLww(spark, sfDir).collect()
    val again = graft.operators.Relational.upsertLww(spark, sfDir).collect()
    assert(base.sameElements(again))
    // one row per key
    val keys = base.map(_.getAs[Long]("o_custkey"))
    assert(keys.distinct.length === keys.length)
  }
}
