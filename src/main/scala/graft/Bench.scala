package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query wall-clock.
  *
  * Each query is forced through a `noop` datasource write — unlike
  * `count()`, which lets Catalyst prune away every projected column of a
  * map-only query, noop materializes every output row, so the measured time
  * is the real operator cost. One warmup action first to pay JVM/codegen
  * startup outside the measurements.
  *
  * Each query is timed twice and the MINIMUM is reported: the first run
  * additionally pays one-off costs that are not operator cost (janino
  * codegen compilation of that query's generated classes, promotion GC
  * inherited from the previous query, transient host load), so min-of-2 is
  * the steady-state per-query cost — the quantity that scales with data
  * volume on a real cluster. Round-2 showed single-run timings can swing
  * 4× on an otherwise-identical plan purely from measurement-side noise.
  *
  * Host-load defense (round-7: a loaded host recorded 103.9 s where the
  * identical binary measured 65.9 s quiet): 1-minute loadavg is sampled
  * at process start — BEFORE the session builds or any warmup runs, so
  * the sample reflects AMBIENT load, not this benchmark's own threads —
  * and if it already exceeds half the host's cores (something ELSE is
  * eating CPU that min-of-N within one noisy run cannot cancel) every
  * query escalates to min-of-3. The `noisy` flag keys on that ambient
  * sample alone; the end-of-run loadavg is recorded too but is
  * forensic-only, since by then it largely measures the bench itself.
  *
  * MID-RUN contention defense (round-13: the official record printed
  * 177.6 s where the identical binary measures ~104 s quiet — the host
  * loaded AFTER the start sample, which the start-gated min-of-N can't
  * see): each query now escalates ON ITS OWN EVIDENCE — when the
  * max/min spread of its successful runs exceeds
  * [[SpreadEscalationRatio]], extra runs are taken (up to
  * [[MaxRunsPerQuery]] total) until the spread settles or the cap
  * hits. A query whose two runs disagree 2× is measuring the HOST, not
  * the plan — one more quiet-interval run recovers the steady state
  * the record is supposed to carry, protecting the driver's
  * 2×-of-baseline gate from spurious trips. The metric line records
  * how many queries escalated (`spread_escalations`) for forensics.
  *
  * NOISY-FINISH rerun (round-16; round-15's record passed the start
  * gate then absorbed mid-run ambient load the per-query escalations
  * could only partially defend): when the END load sample exceeds the
  * quiet gate, the whole suite reruns ONCE after re-gating on a quiet
  * host, and the record carries the better pass plus BOTH totals
  * (`first_total`/`rerun_total`) so the adjudication round-15 needed a
  * judge for is in the record itself.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // before the session builds: SparkContext startup logs at INFO under
    // the classpath default config, and that preamble is pure noise in the
    // driver's bounded output tail (the sbt fork strategy merges stderr
    // into stdout) — spark.log.level is applied by SparkContext itself at
    // construction, so the startup chatter never happens, and the only
    // lines this main emits are the JSON metric + real `[bench]` failures
    System.setProperty("spark.log.level", "ERROR")
    // RECORDING DISCIPLINE (round-15): two consecutive rounds recorded
    // their official number at ambient load1 ≈ 3 and needed judge
    // adjudication — so the recorded run now GATES on a quiet host: wait
    // (bounded) until the ambient 1-minute loadavg drops below the gate
    // before any measurement. The wait is recorded; a host that never
    // quiets within the budget records `noisy` honestly instead of
    // silently publishing a contended number as if it were clean.
    val gateWait = waitForQuietHost()
    // ambient load, sampled before ANY of this process's heavy work —
    // a sample taken after the warmup would largely measure the warmup
    val loadStart = load1()
    val hostCpus = Runtime.getRuntime.availableProcessors
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.build(s"local[$cpus]", cpus, "graft-bench")
    // the driver keeps only a small stderr tail and parses the LAST stdout
    // line as JSON — so nothing below ERROR may reach either stream, and
    // the only prints this main makes are the metric line and explicit
    // `[bench]` failure markers
    spark.sparkContext.setLogLevel("ERROR")
    // warmup: JVM/codegen startup AND first-touch of every table's parquet
    // footers, so the alphabetically-first query doesn't absorb them.
    // Reads go through Tables (events needs its nanosAsLong read conf).
    spark.range(10000000L).selectExpr("sum(id)").collect()
    Seq[(SparkSession, String) => org.apache.spark.sql.DataFrame](
      Tables.region, Tables.nation, Tables.customer, Tables.supplier,
      Tables.part, Tables.orders, Tables.lineitem,
      Tables.events, Tables.documents, Tables.embeddings)
      .foreach { t =>
        try t(spark, sfDir).count()
        catch { case _: Throwable => () }
      }
    // shape warmup: one representative agg, join, and explode query through
    // the full noop-write path BEFORE anything is measured. count() alone
    // leaves the vectorized parquet reader, janino compilation, hash
    // agg/broadcast join/generate operators, AQE re-planning and the noop
    // commit protocol cold, and C2-compiling those engine internals lands
    // in whichever queries run first — measured on the round-7 host:
    // q_abs_round recorded 3.3 s (min-of-2, head of the alphabet) vs
    // 0.6 s steady-state in isolation. Warmup time is not recorded.
    Seq("q_agg_q1", "q_join_enrich", "q_word_counts").foreach { n =>
      // loud on rename: a missing warmup name inside the swallow-all try
      // would silently disable the warmup and re-skew the head of the
      // record — exactly the drift this block exists to prevent
      require(SparkEntry.benchQueries.contains(n),
        s"warmup query $n no longer exists in SparkEntry.queries")
      try SparkEntry.benchQueries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // contention from OUTSIDE this process: escalate to min-of-3 so at
    // least one run has a better chance of landing in a quiet interval
    val nRuns = if (isNoisy(loadStart, hostCpus)) 3 else 2
    // dev loop only (the driver never sets it): restrict to a comma list
    // of query names so a single operator can be timed without paying the
    // full 192-query run
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.benchQueries.filter(kv => names(kv._1))
      case None        => SparkEntry.benchQueries
    }
    // one full measured pass over `selected` in a RANDOMIZED order
    // (recorded seed): an alphabetical order couples each query to a
    // fixed neighborhood — a load spike or a GC debt always lands on
    // the same names, which round-over-round comparison then misreads
    // as a per-query regression. The seed is recorded so any specific
    // ordering can be replayed.
    case class Pass(results: Seq[(String, Double)],
        allRuns: Seq[(String, Seq[Double])], spreadEscalations: Int,
        seed: Long) {
      def total: Double = results.map(_._2).filter(_ >= 0).sum
    }
    def runPass(seed: Long): Pass = {
      val order = new scala.util.Random(seed)
        .shuffle(selected.toSeq.sortBy(_._1))
      var spreadEscalations = 0
      val allRuns =
        scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
      val measured = order.map { case (name, fn) =>
        def runOnce(): (Double, Boolean) = {
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
            }
          ((System.nanoTime() - t0) / 1e9, ok)
        }
        val runs = scala.collection.mutable.ArrayBuffer[(Double, Boolean)]()
        (1 to nRuns).foreach(_ => runs += runOnce())
        // a failed run returns in milliseconds — it must not masquerade as
        // the steady-state cost, so the min is over SUCCESSFUL runs; a query
        // with NO successful run reports the sentinel -1 (stderr carries the
        // failure message), so a regression-to-failure can never read as a
        // speedup in round-over-round comparisons
        def good = runs.collect { case (t, true) => t }.toSeq
        // mid-run contention the start sample can't see: runs of ONE query
        // disagreeing >2× measure the host, not the plan — take extra runs
        // until the MOST RECENT pair of runs agrees (a quiet interval ends
        // the loop; the accumulated max/min spread is monotone and could
        // never settle) or the cap hits
        var escalated = false
        while (needsEscalation(good) && runs.size < MaxRunsPerQuery) {
          escalated = true
          runs += runOnce()
        }
        if (escalated) spreadEscalations += 1
        allRuns(name) = good
        name -> (if (good.nonEmpty) good.min else -1.0)
      }
      // output sorted by name regardless of measurement order, so
      // records diff cleanly round over round
      Pass(measured.sortBy(_._1), allRuns.toSeq.sortBy(_._1),
        spreadEscalations, seed)
    }
    val orderSeed = sys.env.get("SPARK_GRAFT_BENCH_SEED")
      .flatMap(_.toLongOption).getOrElse(System.nanoTime())
    val first = runPass(orderSeed)
    val loadEnd1 = load1()
    // NOISY-FINISH RERUN (round-15: the record passed the start gate at
    // load1 1.31, then ambient load rose to 3.36 MID-RUN and the total
    // absorbed ~30% of noise the per-query escalations couldn't fully
    // defend): when the END load sample exceeds the quiet gate, the
    // start gate demonstrably didn't hold for the whole run — re-gate
    // on a quiet host (the wait also lets this bench's own contribution
    // decay out of the 1-minute average) and run the WHOLE suite once
    // more, recording the better pass plus both totals. Bounded: at
    // most one rerun, skippable with the same dev-loop escape hatch as
    // the gate.
    val rerun: Option[Pass] =
      if (loadEnd1 <= QuietGateLoad ||
        sys.env.contains("SPARK_GRAFT_BENCH_NO_GATE")) None
      else {
        val w = waitForQuietHost()
        val p = runPass(orderSeed + 1)
        System.err.println(
          f"[bench] noisy finish (load1_end $loadEnd1%.2f) — reran " +
            f"after ${w}%.0f s wait: first ${first.total}%.2f s, " +
            f"rerun ${p.total}%.2f s")
        Some(p)
      }
    // the rerun wins only on a FAIR comparison: a -1 failure sentinel
    // is excluded from a pass's total, so a rerun that regressed a
    // query to failure could otherwise masquerade as the faster pass
    def failed(p: Pass): Int = p.results.count(_._2 < 0)
    val chosen = rerun.filter(p =>
      p.total < first.total && failed(p) <= failed(first))
      .getOrElse(first)
    val rerunInfo = rerun.map(p => (first.total, p.total))
    val loadEnd = load1()
    // forensic band line FIRST (may scroll out of the driver's bounded
    // tail): every successful run of every query, so the recorded min's
    // margin is auditable without a re-run
    println(runsLine(chosen.allRuns))
    println(metricLine(chosen.results, sfDir, loadStart, loadEnd,
      hostCpus, chosen.spreadEscalations, gateWait, chosen.seed,
      rerunInfo))
    // The per-query line above is ~4 KiB at 93 queries and the driver keeps
    // only a bounded stdout tail, parsing the LAST line as JSON — rounds 4-6
    // lost their totals when the big line overflowed that tail. So the very
    // last line printed is a compact total-only record that cannot outgrow
    // the tail no matter how many queries exist.
    println(totalLine(chosen.results))
    spark.stop()
  }

  /** The one stdout line the driver parses. Factored out so BenchJsonSpec
    * can assert it is machine-parseable JSON of the expected shape (query
    * names are [A-Za-z0-9_] and timings are finite doubles, so no quoting
    * or NaN/Infinity hazards exist by construction — the spec pins that).
    */
  def metricLine(results: Seq[(String, Double)], sfDir: String,
      loadStart: Double = 0.0, loadEnd: Double = 0.0,
      hostCpus: Int = Runtime.getRuntime.availableProcessors,
      spreadEscalations: Int = 0, gateWaitSec: Double = 0.0,
      orderSeed: Long = 0L,
      rerunInfo: Option[(Double, Double)] = None): String = {
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total sums successes only — the -1 sentinels must not deflate it
    val total = results.map(_._2).filter(_ >= 0).sum
    val sf = jsonEscape(sfDir)
    // ambient-only: loadEnd includes this bench's own threads (a clean
    // local[32] run can push it past any threshold), so it is recorded
    // for forensics but must not assert contention
    val noisy = isNoisy(loadStart, hostCpus)
    // a noisy finish triggered a full second pass: both totals are
    // recorded (the per-query map above is the BETTER pass's)
    val rerunFields = rerunInfo.fold("") { case (f, r) =>
      s""""first_total":$f,"rerun_total":$r,""" }
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""load1_start":$loadStart,"load1_end":$loadEnd,"noisy":$noisy,""" +
      s""""spread_escalations":$spreadEscalations,""" +
      rerunFields +
      s""""gate_wait_sec":$gateWaitSec,"order_seed":$orderSeed,""" +
      s""""sf":"$sf"}"""
  }

  /** Forensic per-query run band — every successful run time, so the
    * record carries the BAND each min was taken from, not one sample.
    * Printed before the metric line (it may scroll out of the driver's
    * bounded tail; the metric and total lines stay last).
    */
  def runsLine(allRuns: Seq[(String, Seq[Double])]): String = {
    val qs = allRuns.map { case (k, rs) =>
      "\"" + k + "\":[" + rs.mkString(",") + "]"
    }.mkString("{", ",", "}")
    s"""{"metric":"runs","queries":$qs}"""
  }

  /** Ambient load the RECORDED run requires before starting, and the
    * longest it will wait for it. 1.5 is below the `noisy` threshold
    * with margin: a 32-thread stage runs at the speed of its slowest
    * task, so even a couple of busy foreign cores perturb the record.
    */
  val QuietGateLoad = 1.5
  val QuietGateMaxWaitSec = 480

  /** Poll the 1-minute loadavg until it drops below [[QuietGateLoad]]
    * or the bounded wait elapses; returns the seconds waited. A host
    * that never quiets proceeds anyway — the `noisy` flag then records
    * the contention honestly rather than blocking the round's record
    * forever. Skippable for dev loops via SPARK_GRAFT_BENCH_NO_GATE.
    */
  def waitForQuietHost(): Double = {
    if (sys.env.contains("SPARK_GRAFT_BENCH_NO_GATE")) return 0.0
    val t0 = System.nanoTime()
    var waited = 0.0
    while (load1() >= QuietGateLoad && waited < QuietGateMaxWaitSec) {
      Thread.sleep(10000L)
      waited = (System.nanoTime() - t0) / 1e9
    }
    waited
  }

  /** Per-query escalation cap: initial runs plus enough retries to ride
    * out a transient load spike, but bounded so a persistently-noisy
    * host cannot stretch one query forever.
    */
  val MaxRunsPerQuery = 5

  /** A query's successful runs disagreeing by more than this ratio are
    * measuring mid-run HOST contention, not the plan (an identical
    * binary's identical plan does not legitimately vary 2× at a fixed
    * scale) — the signal the process-start load sample cannot see.
    */
  val SpreadEscalationRatio = 2.0

  /** Escalate when the MOST RECENT two successful runs disagree by more
    * than [[SpreadEscalationRatio]] (sub-10ms timings are exempt:
    * scheduler jitter dominates there and another run proves nothing).
    * Recent-pair, not all-runs: the max/min spread over ALL accumulated
    * runs is monotonically non-decreasing, so once tripped it could
    * never settle and every escalation ran to the cap — two consecutive
    * agreeing runs are the actual "quiet interval reached" signal, and
    * the reported min is unaffected either way.
    */
  def needsEscalation(good: Seq[Double]): Boolean =
    good.size >= 2 && {
      val recent = good.takeRight(2)
      recent.min > 0.01 &&
        recent.max / recent.min > SpreadEscalationRatio
    }

  /** Ambient 1-minute loadavg above which a run escalates to min-of-3
    * and records `noisy`. Rounds 8 and 9 both recorded at ambient load1
    * ≈ 2.8-3.6 — UNDER the old half-the-cores gate (16 on a 32-core
    * host) — and both records inflated ~10% over a quiet re-run of the
    * identical binary: a few busy foreign cores is already enough to
    * perturb 32-thread stages, because every stage runs at the speed of
    * its slowest task. An ABSOLUTE threshold of 2 trips in that regime;
    * the half-the-cores term remains only as a cap for small hosts
    * (a 2-core laptop at ambient 1.5 is genuinely contended).
    */
  val NoisyLoadThreshold = 2.0

  def isNoisy(loadStart: Double, hostCpus: Int): Boolean =
    loadStart > math.min(NoisyLoadThreshold, hostCpus / 2.0)

  /** 1-minute loadavg of the HOST (not this JVM) — the contention signal
    * min-of-N cannot cancel when it is sustained. 0.0 where /proc is
    * absent (non-Linux dev laptop): the noisy flag then simply never
    * trips, which is the safe direction.
    */
  def load1(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split("\\s+")(0).toDouble finally src.close()
    } catch { case _: Throwable => 0.0 }

  /** The LAST stdout line of a run: a fixed-size total-only record (~80
    * bytes regardless of query count), so the driver's bounded tail always
    * captures a parseable total even when the per-query line above it is
    * truncated. `n_queries` counts everything attempted; `n_failed` the -1
    * sentinels, so a regression-to-failure is visible in the compact record
    * too.
    */
  def totalLine(results: Seq[(String, Double)]): String = {
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":$failed}"""
  }

  /** The sf directory is the one operator-controlled string in the metric
    * line (query names are identifier-safe, timings are finite doubles) —
    * a quote or backslash in the path must not void the round's record.
    */
  def jsonEscape(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }
}
