package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the prev-artifact tail-scrape fallback in [[Bench.scrapeTail]].
  *
  * The bench artifact line is `{"metric":...,"queries":{...},"failed":[...],
  * "calibration":{...},"isolated":{...},...}`. When json4s parsing fails
  * (front-truncated line), the scrape must NOT pick up the `isolated`
  * section's re-run values — it reuses query names and appears after
  * `queries`, so an unscoped last-occurrence `toMap` would silently
  * substitute isolated numbers for the per-query mins.
  */
class BenchScrapeSpec extends AnyFunSuite {
  private val known = Set("q1", "q2", "dd_x")

  test("scrape stops at the first post-queries section marker") {
    val tail =
      """"queries":{"q1":1.500,"q2":0.250,"dd_x":10.490},""" +
        """"failed":[],"calibration":{"start":2.356,"end":1.315},""" +
        """"isolated":{"dd_x":4.010,"q1":0.900}"""
    val m = Bench.scrapeTail(tail, known)
    assert(m === Map("q1" -> 1.5, "q2" -> 0.25, "dd_x" -> 10.49))
  }

  test("first occurrence wins even with no section markers") {
    val tail = """"q1":1.500,"q2":0.250,"q1":0.900"""
    val m = Bench.scrapeTail(tail, known)
    assert(m("q1") === 1.5)
  }

  test("unknown keys are dropped; earliest marker bounds the scope") {
    // "isolated" appearing before "failed" must still bound the scrape.
    val tail =
      """"metric":"total_sec","value":115.6,"q2":0.250,""" +
        """"isolated":{"q1":0.900},"failed":["q9"],"q1":7.000"""
    val m = Bench.scrapeTail(tail, known)
    assert(m === Map("q2" -> 0.25))
  }

  test("empty and markerless tails scrape cleanly") {
    assert(Bench.scrapeTail("", known).isEmpty)
    assert(Bench.scrapeTail(""""q2":3.125""", known) === Map("q2" -> 3.125))
  }

  // --- parseArtifactText: the three artifact shapes ---

  test("driver wrapper shape: queries under parsed") {
    val text =
      """{"round":10,"parsed":{"metric":"total","value":48.7,""" +
        """"queries":{"q1":1.500,"q2":0.250}},"tail":""}"""
    assert(Bench.parseArtifactText(text, known) ===
      Map("q1" -> 1.5, "q2" -> 0.25))
  }

  test("raw bench line shape: top-level queries (BENCH_SF1 family)") {
    val text =
      """{"metric":"total","value":12.0,"unit":"sec",""" +
        """"queries":{"q1":4.000,"dd_x":8.000},"failed":[],""" +
        """"calibration":{"start":1.0,"end":1.1},"isolated":{"q1":3.000},""" +
        """"prev_ref":null,"sf":"tmp/sf1"}"""
    // top-level "queries" must win; the isolated re-run values must not
    // leak in even though they reuse query names.
    assert(Bench.parseArtifactText(text, known) ===
      Map("q1" -> 4.0, "dd_x" -> 8.0))
  }

  test("null parsed falls back to the tail scrape") {
    val text =
      """{"round":8,"parsed":null,"tail":"...\"queries\":{\"q2\":2.000},""" +
        """\"failed\":[],\"isolated\":{\"q2\":1.000}"}"""
    assert(Bench.parseArtifactText(text, known) === Map("q2" -> 2.0))
  }

  test("unparseable artifact text yields empty, not a throw") {
    assert(Bench.parseArtifactText("not json at all", known).isEmpty)
    assert(Bench.parseArtifactText("", known).isEmpty)
  }
}
