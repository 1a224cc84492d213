package graft

import graft.queries.{PipelineQueries, TpchQueries}

/** Plan-regression guards: the optimizations the engine's 100 TB story
  * rests on must be visible in the physical plan, so a refactor that
  * silently loses a broadcast, un-pushes a filter, or degrades the LSH
  * band join to an all-pairs product fails CI instead of shipping.
  */
class PlanSpec extends GraftSpecBase {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q3/q12/q17 broadcast their small side") {
    for ((name, q) <- Seq(
        "q3" -> TpchQueries.q3(spark, sfDir),
        "q12" -> TpchQueries.q12(spark, sfDir),
        "q17" -> TpchQueries.q17(spark, sfDir))) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"),
        s"$name lost its broadcast join:\n$plan")
    }
  }

  test("q3/q12/q17 push their predicates into the parquet scan") {
    for ((name, q) <- Seq(
        "q3" -> TpchQueries.q3(spark, sfDir),
        "q12" -> TpchQueries.q12(spark, sfDir),
        "q17" -> TpchQueries.q17(spark, sfDir))) {
      val plan = planOf(q)
      // at least one scan must carry a real pushed filter (not just "[]")
      val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan)
      assert(pushed.isDefined,
        s"$name reads its scans unfiltered:\n$plan")
    }
  }

  test("minhash LSH candidate join is a hash join, never a cartesian product") {
    val plan = planOf(PipelineQueries.all("dd_minhash_pairs")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"),
      s"LSH band join degraded to all-pairs:\n$plan")
  }

  test("decontamination probes a broadcast of the bench grams, not a shuffle join") {
    val plan = planOf(
      graft.queries.CurationQueries.all("dd_decontaminate")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"bench gram set is no longer broadcast:\n$plan")
  }

  test("PII scan and chunking stay shuffle-free (pure per-row projections)") {
    for ((name, q) <- Seq(
        "txt_pii" -> graft.queries.CurationQueries.all("txt_pii")(spark, sfDir),
        "txt_chunks" -> graft.queries.CurationQueries.all("txt_chunks")(spark, sfDir))) {
      val plan = planOf(q)
      assert(!plan.contains("Exchange"),
        s"$name picked up a shuffle it doesn't need:\n$plan")
    }
  }

  test("sequence packing shuffles once, on the writer-stream key") {
    val plan = planOf(
      graft.queries.CurationQueries.all("op_pack_sequences")(spark, sfDir))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"packing should have exactly the one stream-partition exchange, found $exchanges:\n$plan")
  }
}
