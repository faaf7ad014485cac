package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression band: parsing of the committed band file and
  * the band×3 comparison rule, plus the contract that the committed
  * band stays aligned with the registered query surface (a renamed
  * query must not silently lose its regression check).
  */
class BenchBandSpec extends AnyFunSuite {

  test("parseMins reads the mins object, ignores the envelope") {
    val json =
      """{"recorded_at_round":9,"sf":"sf0.1",
        |"mins":{"q1_agg":0.31,"d2":1.5e0,"t7":0.08}}""".stripMargin
    assert(BenchBand.parseMins(json) ==
      Map("q1_agg" -> 0.31, "d2" -> 1.5, "t7" -> 0.08))
  }

  test("parseMins is empty on missing/odd shapes, never throws") {
    assert(BenchBand.parseMins("") == Map.empty)
    assert(BenchBand.parseMins("""{"queries":{"a":1}}""") == Map.empty)
    assert(BenchBand.parseMins("""{"mins":}""") == Map.empty)
  }

  test("regressions flags only fresh mins above band x factor") {
    val band = Map("a" -> 1.0, "b" -> 0.5, "c" -> 2.0)
    val fresh = Map("a" -> 3.5, "b" -> 1.4, "d" -> 99.0)
    // a: 3.5 > 3.0 -> flagged; b: 1.4 < 1.5 -> fine; d: not in band ->
    // skipped (new query); c: not fresh -> skipped
    assert(BenchBand.regressions(fresh, band) == Map("a" -> ((3.5, 1.0))))
  }

  test("zero/negative band entries never divide into a flag") {
    assert(BenchBand.regressions(Map("a" -> 5.0), Map("a" -> 0.0)) == Map.empty)
  }

  test("committed band file parses and covers the registered surface exactly") {
    val path = java.nio.file.Paths.get("BENCH_BAND.json")
    assume(java.nio.file.Files.exists(path), "band not captured yet")
    val mins = BenchBand.load(path.toString)
    assert(mins.nonEmpty, "band file exists but parsed empty")
    val registered = SparkEntry.queries.keySet
    val stale = mins.keySet -- registered
    assert(stale.isEmpty, s"band names unregistered queries: $stale")
    // exact-count contract (r9 advice #5): parseMins slices to the
    // first '}' after "mins", so any future nesting inside the object
    // would silently truncate the band and regression checks would
    // vanish without a failure anywhere. Pinning size == registered
    // count turns silent truncation (and a stale band after adding
    // queries) into a red test: recapture the band when this fires.
    val missing = registered -- mins.keySet
    assert(mins.size == registered.size,
      s"band covers ${mins.size}/${registered.size} queries; missing: $missing")
  }
}
