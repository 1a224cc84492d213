package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.la.BlockMatrix
import graft.model.Tables
import graft.operators.{Dedup, MlWorkloads}

/** Iterative ML workloads from the reference corpus (§2.6): PageRank,
  * L2 regression, top-k Jaccard similarity.
  */
object MlQueries {

  /** PageRank on the customer→supplier purchase graph (distinct edges from
    * orders ⋈ lineitem). Rows-only driver check; convergence is unit-tested.
    */
  def mlPageRank(spark: SparkSession, d: String): DataFrame = {
    val edges = Tables.orders(spark, d)
      .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .distinct()
    // 3 iterations: enough to exercise the loop + checkpoint machinery;
    // per-iteration cost on the fixtures is AQE/job overhead, not data
    MlWorkloads.pageRank(spark, edges, iterations = 3)
      .select(col("node"), round(col("rank"), 6).as("rank"))
  }

  /** beta = (X'X)^-1 X'y on embeddings vs label — the reference's L2
    * sample workload (sample02_L2.pdml). Rows-only; algebra unit-tested.
    */
  def laL2Fit(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    val n = emb.count()
    val xRows = emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    val x = BlockMatrix.fromRowVectors(spark, xRows, n, 64, 256, 32)
    val yRows = emb.select(col("vec_id"), col("label")).as[(Long, Int)]
      .map { case (id, l) => (id, Array(l.toDouble)) }
    val y = BlockMatrix.fromRowVectors(spark, yRows, n, 1, 256, 1)
    MlWorkloads.l2Fit(x, y).toCells.toDF("i", "j", "v")
      .select(col("i"), col("j"), round(col("v"), 6).as("v"))
  }

  /** top-10 most-similar document pairs by 3-gram jaccard — the reference's
    * TopJaccard workload (src/tpchBench/headers/TopJaccard.h:17) as
    * LSH + TakeOrderedAndProject.
    */
  def ddTopkJaccard(spark: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(spark, d), "doc_id", "text",
      n = 3, threshold = 0.5)
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(10)

  val ddTopkJaccardSql: String =
    PipelineQueries.ddNgramSql + "\nORDER BY jaccard DESC, id_a, id_b LIMIT 10"

  /** 2-layer feed-forward inference over embeddings with deterministic
    * (formula-seeded) weights; output = per-class prediction counts.
    * Rows-only; the kernel algebra is unit-tested.
    */
  def mlFfInference(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    val n = emb.count()
    val xRows = emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    val x = BlockMatrix.fromRowVectors(spark, xRows, n, 64, 256, 32)
    val hiddenDim = 16
    val classes = 4
    val w1 = BlockMatrix.fromLocal(spark,
      Array.tabulate(64 * hiddenDim)(i => math.sin(i.toDouble)), 64, hiddenDim, 32, hiddenDim)
    val w2 = BlockMatrix.fromLocal(spark,
      Array.tabulate(hiddenDim * classes)(i => math.cos(i.toDouble)), hiddenDim, classes,
      hiddenDim, classes)
    MlWorkloads.ffInference(x, w1, w2)
      .groupBy(col("predicted_class"))
      .agg(count(lit(1)).as("n"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_pagerank" -> mlPageRank,
    "ml_ff_inference" -> mlFfInference,
    "la_l2_fit" -> laL2Fit,
    "dd_topk_jaccard" -> ddTopkJaccard)

  val oracles: Map[String, String] = Map(
    "dd_topk_jaccard" -> ddTopkJaccardSql)
}
