package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The driver parses the LAST stdout line of a Bench run as JSON; a
  * malformed metric line silently voids a whole round's performance
  * record. Parse the exact string Bench prints with a real JSON parser
  * (Jackson, already on the Spark classpath) across the shapes a run can
  * produce — including the -1 failure sentinel and every actual query
  * name — so no formatting regression can ship.
  */
class BenchJsonSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper

  test("metric line is valid JSON with the expected fields") {
    val line = Bench.metricLine(
      Seq("q_a" -> 0.25, "q_b" -> 1.5E-3, "q_failed" -> -1.0), "/data/sf")
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() === "total")
    assert(node.get("unit").asText() === "sec")
    assert(node.get("sf").asText() === "/data/sf")
    // total excludes the -1 sentinel
    assert(math.abs(node.get("value").asDouble() - 0.2515) < 1e-12)
    assert(node.get("queries").get("q_failed").asDouble() === -1.0)
    assert(node.get("queries").size() === 3)
  }

  test("a noisy-finish rerun records BOTH totals and stays parseable") {
    val line = Bench.metricLine(Seq("q_a" -> 0.25), "/d", 0.5, 3.4,
      hostCpus = 32, rerunInfo = Some((137.8, 104.2)))
    val node = mapper.readTree(line)
    assert(node.get("first_total").asDouble() === 137.8)
    assert(node.get("rerun_total").asDouble() === 104.2)
    // without a rerun the fields are simply absent
    val plain = mapper.readTree(
      Bench.metricLine(Seq("q_a" -> 0.25), "/d"))
    assert(plain.get("first_total") == null)
    assert(plain.get("rerun_total") == null)
  }

  test("load fields land in the metric line and the noisy flag trips at " +
      "the absolute ambient threshold (capped by half-cores on small hosts)") {
    val quiet = mapper.readTree(
      Bench.metricLine(Seq("q_a" -> 1.0), "/d", 0.5, 1.0, hostCpus = 8))
    assert(quiet.get("load1_start").asDouble() === 0.5)
    assert(quiet.get("load1_end").asDouble() === 1.0)
    assert(!quiet.get("noisy").asBoolean())
    // only the AMBIENT (start) sample asserts contention: the end sample
    // includes the bench's own threads, so a high loadEnd alone must NOT
    // flag a clean run
    val selfLoad = mapper.readTree(
      Bench.metricLine(Seq("q_a" -> 1.0), "/d", 0.5, 7.2, hostCpus = 8))
    assert(!selfLoad.get("noisy").asBoolean())
    val loud = mapper.readTree(
      Bench.metricLine(Seq("q_a" -> 1.0), "/d", 6.1, 7.2, hostCpus = 8))
    assert(loud.get("noisy").asBoolean())
    // the r8/r9 regime: ambient ≈ 2.8 on a 32-core host slipped UNDER the
    // old half-the-cores gate and inflated the record ~10% — the absolute
    // threshold must trip there
    assert(Bench.isNoisy(2.8, 32))
    assert(!Bench.isNoisy(1.5, 32))
    // small hosts cap at half the cores: a 2-core box at 1.5 is contended
    assert(Bench.isNoisy(1.5, 2))
    val r9Regime = mapper.readTree(
      Bench.metricLine(Seq("q_a" -> 1.0), "/d", 2.81, 3.0, hostCpus = 32))
    assert(r9Regime.get("noisy").asBoolean())
  }

  test("a hostile sf path (quotes, backslashes, control chars) still " +
      "yields parseable JSON") {
    val hostile = "/data/sf\"1\\x\n"
    val node = mapper.readTree(Bench.metricLine(Seq("q_a" -> 1.0), hostile))
    assert(node.get("sf").asText() === hostile)
  }

  test("the final compact total line parses, carries the total, and stays " +
      "tail-sized at the full query count") {
    val results = Seq("q_a" -> 0.25, "q_b" -> 1.5E-3, "q_failed" -> -1.0)
    val line = Bench.totalLine(results)
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() === "total")
    assert(node.get("unit").asText() === "sec")
    assert(math.abs(node.get("value").asDouble() - 0.2515) < 1e-12)
    assert(node.get("n_queries").asInt() === 3)
    assert(node.get("n_failed").asInt() === 1)
    // the whole point: the last line must fit any bounded tail, independent
    // of how many queries the engine grows — pin it at the real query count
    val full = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1.0)
    assert(Bench.totalLine(full).length < 120)
    assert(mapper.readTree(Bench.totalLine(full)).get("n_queries").asInt()
      === SparkEntry.queries.size)
  }

  test("every real query name round-trips through the metric line") {
    val results = SparkEntry.queries.keys.toSeq.sorted.zipWithIndex
      .map { case (n, i) => n -> i * 0.1 }
    val node = mapper.readTree(Bench.metricLine(results, "/root/testdata/sf0.1"))
    assert(node.get("queries").size() === SparkEntry.queries.size)
    results.foreach { case (n, v) =>
      assert(math.abs(node.get("queries").get(n).asDouble() - v) < 1e-12, n)
    }
  }

  test("per-query spread escalation: runs disagreeing >2x demand more " +
      "runs (mid-run host contention the start sample can't see), " +
      "agreeing or sub-10ms runs don't, and the count lands in the " +
      "metric line") {
    // the r13 record printed 177.6 s where the binary measures ~104 s
    // quiet — the contention arrived AFTER the start sample; per-query
    // spread is the only signal that sees it
    assert(Bench.needsEscalation(Seq(0.5, 1.2)))     // 2.4x: host noise
    assert(!Bench.needsEscalation(Seq(0.5, 0.6)))    // steady state
    assert(!Bench.needsEscalation(Seq(0.004, 0.009))) // jitter regime
    assert(!Bench.needsEscalation(Seq(0.5)))         // one run: no spread
    assert(!Bench.needsEscalation(Seq.empty))        // all-failed query
    assert(Bench.needsEscalation(Seq(0.3, 0.31, 0.9))) // still split
    assert(Bench.MaxRunsPerQuery >= 4) // room for 2 base + ≥2 retries
    val node = mapper.readTree(Bench.metricLine(Seq("q_a" -> 1.0), "/d",
      0.5, 1.0, hostCpus = 8, spreadEscalations = 3))
    assert(node.get("spread_escalations").asInt() === 3)
  }

  test("documented query counts in SURVEY.md and README.md match the " +
      "registry (ends the recurring doc-drift)") {
    // every round that adds queries used to leave stale counts behind in
    // the narrative docs; tie them to SparkEntry.queries.size so the suite
    // fails the moment either drifts
    val pat = """(\d+) queries, ALL hash-gated""".r
    for (doc <- Seq("SURVEY.md", "README.md")) {
      val path = java.nio.file.Paths.get(doc)
      assert(java.nio.file.Files.exists(path), s"$doc not found in cwd")
      val text = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      val counts = pat.findAllMatchIn(text).map(_.group(1).toInt).toSeq
      assert(counts.nonEmpty, s"$doc no longer states the query count")
      counts.foreach(c => assert(c === SparkEntry.queries.size,
        s"$doc says $c queries; the registry has ${SparkEntry.queries.size}"))
    }
  }
}
