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

  /** Exact oracle for [[mlPageRank]]: the 3 damped iterations unrolled as
    * chained CTEs (DuckDB's recursive CTEs allow only one self-reference —
    * each iteration needs two: contributions + dangling mass — so the
    * fixed iteration count is generated instead). Constants are cast to
    * DOUBLE so both engines run the same IEEE expression; ranks round to
    * 1e-6 on both sides.
    */
  val mlPageRankSql: String = {
    val iters = 3
    val base =
      """WITH e AS (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |deg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst AS node, SUM(r.rank / d.out_deg) AS in_sum
         |  FROM e JOIN r${i - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst),
         |g$i AS (SELECT COALESCE(SUM(r.rank), 0) AS dangling
         |  FROM r${i - 1} r LEFT JOIN deg d ON r.node = d.src
         |  WHERE d.src IS NULL),
         |r$i AS (SELECT n.node,
         |    (1 - CAST(0.85 AS DOUBLE)) + CAST(0.85 AS DOUBLE) *
         |      (COALESCE(c.in_sum, 0) + (SELECT dangling FROM g$i) / (SELECT n FROM nn)) AS rank
         |  FROM nodes n LEFT JOIN c$i c ON n.node = c.node)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"\nSELECT node, round(rank, 6) AS rank FROM r$iters"
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

  /** Normal-equation residual of the L2 fit: ‖X'X·β − X'y‖∞ rounded — an
    * oracle-checkable invariant of the solver (≈0 by construction), the
    * same pattern as la_inverse_check. The β values themselves stay
    * rows-only in la_l2_fit and value-checked in MlSpec.
    */
  def laL2Check(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    val n = emb.count()
    val xRows = emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    val x = BlockMatrix.fromRowVectors(spark, xRows, n, 64, 256, 32)
    val yRows = emb.select(col("vec_id"), col("label")).as[(Long, Int)]
      .map { case (id, l) => (id, Array(l.toDouble)) }
    val y = BlockMatrix.fromRowVectors(spark, yRows, n, 1, 256, 1)
    val beta = MlWorkloads.l2Fit(x, y)
    val lhs = x.gram.multiply(beta)
    val rhs = x.transpose.multiply(y)
    val dev = lhs.subtract(rhs).toCells.map { case (_, _, v) => math.abs(v) }
      .reduce(math.max)
    spark.createDataset(Seq(math.round(dev * 1e4) / 1e4)).toDF("max_residual")
  }

  val laL2CheckSql: String = "SELECT CAST(0.0 AS DOUBLE) AS max_residual"

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

  /** Oracle for [[mlFfInference]]: the forward pass written out in SQL.
    * Mirrors the Spark plan's float association exactly — the 64-wide
    * inner product is summed as two 32-wide block partials (X is blocked
    * at 32 columns), relu after the block add, argmax tiebreak = lowest
    * class. sin/cos weights are formula-seeded on both sides.
    */
  val mlFfInferenceSql: String =
    """WITH h AS (
      |  SELECT e.vec_id AS r, j,
      |    greatest(0,
      |      (SELECT SUM(CAST(e.embedding[i+1] AS DOUBLE) * sin(CAST(i*16+j AS DOUBLE)))
      |       FROM generate_series(0,31) g(i)) +
      |      (SELECT SUM(CAST(e.embedding[i+1] AS DOUBLE) * sin(CAST(i*16+j AS DOUBLE)))
      |       FROM generate_series(32,63) g(i))) AS hv
      |  FROM embeddings e, generate_series(0,15) gj(j)),
      |l AS (
      |  SELECT h.r, c, SUM(h.hv * cos(CAST(h.j*4+c AS DOUBLE))) AS lv
      |  FROM h, generate_series(0,3) gc(c) GROUP BY h.r, c),
      |p AS (
      |  SELECT r, c,
      |    ROW_NUMBER() OVER (PARTITION BY r ORDER BY lv DESC, c) AS rk
      |  FROM l)
      |SELECT c AS predicted_class, COUNT(*) AS n FROM p WHERE rk = 1
      |GROUP BY 1""".stripMargin

  /** GMM component sizes over embeddings (EM, deterministic init) */
  def mlGmm(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val data = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    val model = graft.operators.MlWorkloads2.gmmFit(data, k = 4, iterations = 3)
    graft.operators.MlWorkloads2.gmmAssign(data, model)
      .groupBy(col("component")).agg(count(lit(1)).as("n"))
  }

  /** word-topic matrix from the LDA-style EM over document token counts */
  def mlLda(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
      .as[(Long, String, Long)]
    graft.operators.MlWorkloads2.ldaFit(counts, nTopics = 3, iterations = 5)
  }

  /** pooled LSTM scores over each user's event-value sequence */
  def mlLstm(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val seqs = Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroups { (uid, rows) =>
        val xs = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
          .map(r => Array(r._3)).toArray
        (uid, xs)
      }
    val hidden = 4
    def arr(n: Int, seed: Int) =
      Array.tabulate(n)(i => math.sin(i + seed) * 0.5)
    val w = graft.operators.MlWorkloads2.LstmWeights(
      arr(hidden * 1, 1), arr(hidden * hidden, 2), arr(hidden, 3),
      arr(hidden * 1, 4), arr(hidden * hidden, 5), arr(hidden, 6),
      arr(hidden * 1, 7), arr(hidden * hidden, 8), arr(hidden, 9),
      arr(hidden * 1, 10), arr(hidden * hidden, 11), arr(hidden, 12),
      inDim = 1, hidden = hidden)
    graft.operators.MlWorkloads2.lstmScore(seqs, w)
      .select(col("id").as("user_id"), round(col("score"), 6).as("score"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_pagerank" -> mlPageRank,
    "ml_ff_inference" -> mlFfInference,
    "ml_gmm" -> mlGmm,
    "ml_lda_topics" -> mlLda,
    "ml_lstm_scores" -> mlLstm,
    "la_l2_fit" -> laL2Fit,
    "la_l2_check" -> laL2Check,
    "dd_topk_jaccard" -> ddTopkJaccard)

  val oracles: Map[String, String] = Map(
    "dd_topk_jaccard" -> ddTopkJaccardSql,
    "ml_pagerank" -> mlPageRankSql,
    "ml_ff_inference" -> mlFfInferenceSql,
    "la_l2_check" -> laL2CheckSql)
}
