package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the DuckDB-oracle cost budget against the committed
  * `ORACLE_COST_r{N}.json` (the per-oracle wall-time table
  * `tools/localverify.py` writes as `oracle_cost.json`, copied into the
  * repo root each round).
  *
  * Why this exists: round 12's driver compare was killed by ONE oracle —
  * `pipe_lm_budget`'s, ~10 minutes and >6 GB in DuckDB before its shared
  * CTEs were `MATERIALIZED` — and the round's `CORRECTNESS_r12.json`
  * shipped as `{}`, silently voiding the certification of all 137
  * queries. Oracles are part of the contract and must fit the harness
  * budget; this spec makes a budget-busting oracle fail loudly in
  * `sbt test` BEFORE it can zero a round, the way BenchScrapeSpec pins
  * the bench line's tail window.
  *
  * The registry-coverage assert doubles as a freshness tripwire: adding
  * a query without re-running the compare (and committing the new cost
  * table) fails here, so the committed artifact can never silently go
  * stale while the registry grows.
  */
class OracleCostSpec extends AnyFunSuite {

  /** Worst tolerable single oracle at sf0.01. The fleet-wide compare has
    * to finish inside the driver's window alongside 137+ siblings; 60 s
    * is an order of magnitude above the typical sub-second oracle and a
    * third of the way to the cost that killed round 12's compare.
    */
  private val worstSingleSec = 60.0

  /** Whole-registry ceiling. Round 11's healthy compare ran ~3-4 min;
    * round 12's fatal one ~14. 450 s sits between, with room for a
    * contended host (this box swings 1.4-4x — README "Bench noise")
    * while still failing well before the observed death zone.
    */
  private val totalSec = 450.0

  private def newestArtifact: Option[java.io.File] = {
    val re = """ORACLE_COST_r(\d+)\.json""".r
    Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        f.getName match {
          case re(n) => Some((n.toInt, f))
          case _ => None
        }
      }.sortBy(-_._1).headOption.map(_._2)
  }

  test("a committed oracle-cost artifact exists") {
    assert(newestArtifact.nonEmpty,
      "no ORACLE_COST_r{N}.json in the repo root — run " +
        "`python3 tools/localverify.py <sfDir> <outDir>` and commit its " +
        "oracle_cost.json as ORACLE_COST_r{N}.json")
  }

  test("every registered oracle is in the newest cost table (freshness)") {
    val f = newestArtifact.getOrElse(cancel("no artifact; prior test reports it"))
    val root = org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8))
    val timed = (root \ "oracles") match {
      case org.json4s.JObject(fields) => fields.map(_._1).toSet
      case _ => Set.empty[String]
    }
    val missing = SparkEntry.oracleSql.keySet -- timed
    assert(missing.isEmpty,
      s"${f.getName} has no timing for ${missing.toSeq.sorted.mkString(", ")} — " +
        "the registry grew since the compare last ran; re-run " +
        "tools/localverify.py and commit the fresh cost table")
  }

  test("no single oracle exceeds the per-oracle ceiling") {
    val f = newestArtifact.getOrElse(cancel("no artifact; prior test reports it"))
    val root = org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8))
    val costs = (root \ "oracles") match {
      case org.json4s.JObject(fields) => fields.collect {
        case (k, org.json4s.JDouble(v)) => k -> v
        case (k, org.json4s.JInt(v)) => k -> v.toDouble
        case (k, org.json4s.JDecimal(v)) => k -> v.toDouble
      }
      case _ => Nil
    }
    assert(costs.nonEmpty, s"${f.getName} carries no per-oracle timings")
    val over = costs.filter(_._2 > worstSingleSec)
    assert(over.isEmpty,
      s"oracle(s) over the ${worstSingleSec}s ceiling in ${f.getName}: " +
        over.map { case (k, v) => f"$k=$v%.1fs" }.mkString(", ") +
        " — MATERIALIZE the shared CTEs or verify compositionally " +
        "(the pipe_lm_budget round-12 fix) before this kills a compare")
    val total = costs.map(_._2).sum
    assert(total <= totalSec,
      f"whole-registry oracle wall $total%.1fs exceeds the $totalSec%.0fs " +
        s"budget in ${f.getName}")
  }
}
