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

  test("rebuild discards a stale staging leftover and converges") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
    val root = Files.createTempDirectory("graft-ivf-stale").toString
    val c = new SetCatalog(spark, root)
    SimilaritySearch.buildIvfIndex(spark, c, "idx", "emb", emb)
    // simulate a rebuild aborted BEFORE its swaps: a finished (here,
    // garbage) staging set sits next to the live one
    c.createSet("idx", "emb_centroids_rebuild",
      emb.limit(1).select(col("vec_id").as("junk")), policy = "none")
    SimilaritySearch.rebuildIvfIndex(spark, c, "idx", "emb")
    // staging was discarded and re-derived, not swapped in as-is
    assert(c.meta("idx", "emb_centroids_rebuild").isEmpty &&
      c.meta("idx", "emb_vectors_rebuild").isEmpty)
    assert(c.scanSet("idx", "emb_centroids").columns.toSeq ==
      Seq("bucket", "centroid"))
    val hits = SimilaritySearch
      .searchIvfIndex(spark, c, "idx", "emb", queries, k = 5)
    assert(hits.count() == 5 * queries.count())
    SetCatalog.deleteTree(java.nio.file.Paths.get(root))
  }

  test("rebuild heals a crash between removeSet and the staged rename") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
    val root = Files.createTempDirectory("graft-ivf-crash").toString
    val c = new SetCatalog(spark, root)
    SimilaritySearch.buildIvfIndex(spark, c, "idx", "emb", emb)
    val expect = SimilaritySearch
      .searchIvfIndex(spark, c, "idx", "emb", queries, k = 5)
      .collect().map(_.toSeq).toSet
    // simulate the swap's crash window: the finished staging set is the
    // ONLY copy of the vectors (live set already removed, rename not run)
    val vecs = c.scanSet("idx", "emb_vectors").localCheckpoint(true)
    c.createPartitionedSet("idx", "emb_vectors_rebuild", vecs, "bucket")
    c.removeSet("idx", "emb_vectors")
    assert(c.meta("idx", "emb_vectors").isEmpty)
    // re-running the rebuild must first complete the interrupted swap,
    // then converge to a consistent, searchable index
    SimilaritySearch.rebuildIvfIndex(spark, c, "idx", "emb")
    assert(c.meta("idx", "emb_vectors").isDefined &&
      c.meta("idx", "emb_vectors_rebuild").isEmpty)
    val got = SimilaritySearch
      .searchIvfIndex(spark, c, "idx", "emb", queries, k = 5)
      .collect().map(_.toSeq).toSet
    // retraining over the identical corpus under the md5-ordered sample
    // reproduces the same codebook, hence the same search results
    assert(got == expect)
    SetCatalog.deleteTree(java.nio.file.Paths.get(root))
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
