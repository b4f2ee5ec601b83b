package graft

/** Guards the Bench production-plan rewrite: stripping the trailing
  * presentation sort must be row-preserving for every query shape —
  * including limit queries (where the Sort hides under the Limit and must
  * NOT be stripped) and sort-before-project plans.
  */
class BenchParitySpec extends SparkSpecBase {

  private val sampled = Seq(
    "q_etl_transform",  // sort-before-project (Project over Sort)
    "q_topk",           // TakeOrderedAndProject — ordering is semantic
    "q_asof_join",      // window + presentation sort
    "q_dedup_exact",    // agg + sort
    "q_window_range",   // RANGE window + sort
    "q_corpus_build")   // multi-stage composition

  test("bench (stripped) and verify (sorted) plans return identical rows") {
    sampled.foreach { name =>
      val sorted = SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      val stripped = SparkEntry.benchQueries(name)(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      assert(stripped === sorted, s"row mismatch after sort strip: $name")
    }
  }
}
