package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Bench stdout contract: the driver captures the TAIL of stdout and parses
  * the LAST JSON line, so the compact summary (per-query minimums, docs/sec)
  * must be the final line and must stay small and valid JSON regardless of
  * failed reps (NaN samples) or locale. Round 4's single giant line pushed
  * `queries` out of the tail window — this spec pins the two-line contract.
  */
class BenchOutputSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  test("summaryLine is valid JSON with per-query minimums and docs_per_sec") {
    val line = Bench.summaryLine(
      total = 3.25,
      queries = Seq("q1_pricing_summary" -> 1.25, "validate_verdicts" -> 2.0),
      sfDir = "/root/testdata/sf0.01", cpus = "32",
      nDocs = 60012L, docsPerSec = 30006.0)
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("value").asDouble() == 3.25)
    assert(node.get("unit").asText() == "sec")
    val qs = node.get("queries")
    assert(qs.fieldNames().asScala.toSet ==
      Set("q1_pricing_summary", "validate_verdicts"))
    assert(qs.get("validate_verdicts").asDouble() == 2.0)
    assert(node.get("n_docs").asLong() == 60012L)
    assert(node.get("docs_per_sec").asDouble() == 30006.0)
    assert(node.get("cpus").asText() == "32")
    // the summary line must stay tail-capture-safe: no big diagnostic maps
    assert(!line.contains("samples") && !line.contains("calib_q"))
  }

  test("diagnosticsLine is valid JSON; failed reps emit null, keeping " +
    "samples aligned with calib_q") {
    val samples = Map("qa" -> List(0.5, Double.NaN, 0.4).reverse)
    val calibQ = Map("qa" -> List(0.13, 0.14, 0.13).reverse)
    val line = Bench.diagnosticsLine(
      names = Seq("qa"), sfDir = "sf", cpus = "8",
      calib = Seq(0.13, 0.13, 0.14), samples = samples, calibQ = calibQ,
      stages = Some("""{"dedup_minhash_lsh":{"full":1.0}}"""))
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "diagnostics")
    val s = node.get("samples").get("qa")
    val c = node.get("calib_q").get("qa")
    assert(s.size() == 3 && c.size() == 3) // per-rep alignment preserved
    assert(s.get(1).isNull)                // the failed rep
    assert(s.get(0).asDouble() == 0.5 && s.get(2).asDouble() == 0.4)
    assert(node.get("stages").get("dedup_minhash_lsh").get("full").asDouble() == 1.0)
  }

  test("locale safety: comma-decimal default locale cannot corrupt the JSON") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(Bench.f3(1.5) == "1.500")
      assert(Bench.f3(Double.NaN) == "null")
      val line = Bench.diagnosticsLine(Seq("q"), "sf", "4", Seq(0.125),
        Map("q" -> List(1.5)), Map("q" -> List(0.125)), None)
      mapper.readTree(line) // must parse
    } finally java.util.Locale.setDefault(prev)
  }
}
