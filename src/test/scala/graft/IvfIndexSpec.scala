package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.SimilaritySearch
import graft.storage.SetCatalog

class IvfIndexSpec extends GraftSpecBase {

  private lazy val (cat, built) = {
    val root = Files.createTempDirectory("graft-ivf-spec").toString
    val c = new SetCatalog(spark, root)
    SimilaritySearch.buildIvfIndex(spark, c, "idx", "emb",
      Tables.embeddings(spark, sfDir))
    (c, true)
  }

  test("searching the persisted index equals the in-memory IVF search") {
    assert(built)
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val fromIndex = SimilaritySearch
      .searchIvfIndex(spark, cat, "idx", "emb", queries, k = 5)
      .collect().map(_.toSeq).toSet
    val inMemory = SimilaritySearch
      .ivfTopK(spark, emb, queries, k = 5)
      .collect().map(r => Seq(r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    // bucket partition column round-trips as int; compare the output
    // columns, which are identical
    assert(fromIndex == inMemory && fromIndex.nonEmpty)
  }

  test("the index scan is partition-pruned by the probed buckets") {
    assert(built)
    val queries = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 2)
    val plan = SimilaritySearch
      .searchIvfIndex(spark, cat, "idx", "emb", queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"probe join no longer prunes index partitions:\n$plan")
  }

  test("the vector set is laid out as one directory per bucket") {
    assert(built)
    val meta = cat.meta("idx", "emb_vectors")
    assert(meta.exists(m => m.policy == "dirpart" &&
      m.partitionColumn.contains("bucket")))
    val buckets = cat.scanSet("idx", "emb_vectors")
      .select("bucket").distinct().count()
    assert(buckets > 1 && buckets <= 16)
  }
}
