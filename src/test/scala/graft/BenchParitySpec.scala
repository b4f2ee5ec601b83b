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

  test("strip engages on every presentation-sorted query and leaves no Sort node") {
    import org.apache.spark.sql.catalyst.plans.logical.{LocalLimit, Project, Sort}
    var engaged = 0
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val presentationSorted = df.queryExecution.logical match {
        case s: Sort if s.global                 => true
        case Project(_, s: Sort) if s.global     => true
        case _                                   => false
      }
      if (presentationSorted) {
        engaged += 1
        val stripped = SparkEntry.benchQueries(name)(spark, sfDir).queryExecution.logical
        // Sorts directly under a limit are SEMANTIC top-k (they compile to
        // TakeOrderedAndProject, e.g. q_vocab_coverage's vocabulary cut) —
        // only a sort that orders the whole output is presentational.
        val topK = stripped.collect {
          case LocalLimit(_, s: Sort) => s
        }.toSet
        val leftover = stripped.collect {
          case s: Sort if !topK.contains(s) => s
        }
        assert(leftover.isEmpty,
          s"$name: stripped plan still contains ${leftover.size} Sort node(s)")
      }
    }
    // Most of the contract ends in a presentation sort; if the strip stops
    // engaging (e.g. a plan-shape drift puts a node between Project and
    // Sort), this count collapses and the bench silently re-measures sorts.
    assert(engaged >= 40, s"sort-strip engaged on only $engaged queries")
  }

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
