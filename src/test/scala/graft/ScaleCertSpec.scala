package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the committed decade-scaling certificate's shape
  * (`SCALE_r{N}.json`, written by `tools/scalereport.py` from the two
  * sides' bench artifacts).
  *
  * Since r20 the certificate must carry BOTH sides' operator-internals
  * `diagnostics` blocks (VERDICT r19 stretch #7): the union-find pass
  * count and the wide-sample prefilter attempt/hit counters regress as
  * a SCALE effect first — a sampler that stops certifying on the first
  * attempt at sf0.1 while still passing at sf0.01 is invisible in the
  * per-query walls but an artifact diff here. The per-round bench
  * artifacts have carried the block since r18 (BenchScrapeSpec pins its
  * key set); this spec makes the certificate's copy load-bearing the
  * same way.
  */
class ScaleCertSpec extends AnyFunSuite {

  private def newest(prefix: String): Option[(Int, java.io.File)] = {
    val re = (java.util.regex.Pattern.quote(prefix) + """(\d+)\.json""").r
    Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        f.getName match {
          case re(n) => Some((n.toInt, f))
          case _ => None
        }
      }.sortBy(-_._1).headOption
  }

  test("newest SCALE_r{N}.json (r20+) carries both sides' diagnostics") {
    val (round, f) = newest("SCALE_r").getOrElse(
      fail("no SCALE_r{N}.json in the repo root — run tools/scalereport.py"))
    if (round < 20)
      cancel(s"newest certificate is r$round (pre-diagnostics shape)")
    val root = org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8))
    import org.json4s._
    val diag = root \ "diagnostics"
    def side(name: String): Unit = diag \ name match {
      case JObject(fields) =>
        val keys = fields.map(_._1).toSet
        assert(Set("cc_passes", "sampler_attempts", "sampler_hits")
          .subsetOf(keys),
          s"$name diagnostics lost its pinned counters: $keys")
      case other => fail(s"diagnostics.$name must be an object " +
        s"(the bench artifact's block, copied): $other")
    }
    side("small")
    side("large")
  }
}
