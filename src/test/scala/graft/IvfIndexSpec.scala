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

  test("build(A) + append(B) searches identically to one-pass assignment under A's codebook") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val queries = emb.filter(col("vec_id") < 10)

    val rootApp = Files.createTempDirectory("graft-ivf-app").toString
    val capp = new SetCatalog(spark, rootApp)
    SimilaritySearch.buildIvfIndex(spark, capp, "idx", "emb", a)
    SimilaritySearch.appendToIvfIndex(spark, capp, "idx", "emb", b)
    val appended = SimilaritySearch
      .searchIvfIndex(spark, capp, "idx", "emb", queries, k = 5)
      .collect().map(_.toSeq).toSet

    // reference: same codebook (trained on A), the WHOLE corpus assigned
    // in one pass — rebuilt by hand from the public kernels
    val rootRef = Files.createTempDirectory("graft-ivf-ref").toString
    val cref = new SetCatalog(spark, rootRef)
    SimilaritySearch.buildIvfIndex(spark, cref, "idx", "emb", a)
    val centroids = cref.scanSet("idx", "emb_centroids")
      .orderBy(col("bucket")).collect().map(_.getSeq[Double](1).toArray)
    val assign = SimilaritySearch.nearestUdf(centroids)
    cref.createPartitionedSet("idx", "emb_vectors",
      emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_vec"),
        graft.functions.TextFunctions.l2Norm(col("embedding")).as("n_nrm"),
        assign(col("embedding")).as("bucket")),
      "bucket")
    val onePass = SimilaritySearch
      .searchIvfIndex(spark, cref, "idx", "emb", queries, k = 5)
      .collect().map(_.toSeq).toSet

    assert(appended == onePass && appended.nonEmpty)
    // appended rows must actually live in the standing bucket layout
    assert(capp.meta("idx", "emb_vectors").exists(_.rows == emb.count()))
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
