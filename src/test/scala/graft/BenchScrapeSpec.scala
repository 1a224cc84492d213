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
}
