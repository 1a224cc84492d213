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

  /** embeddings as the (X, y) blocked-matrix pair for the regression
    * workloads — ONE definition so the fit and its invariant check are
    * guaranteed to operate on the same matrices
    */
  private def l2Matrices(spark: SparkSession, d: String): (BlockMatrix, BlockMatrix) = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    val n = emb.count()
    val xRows = emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    val x = BlockMatrix.fromRowVectors(spark, xRows, n, 64, 256, 32)
    val yRows = emb.select(col("vec_id"), col("label")).as[(Long, Int)]
      .map { case (id, l) => (id, Array(l.toDouble)) }
    val y = BlockMatrix.fromRowVectors(spark, yRows, n, 1, 256, 1)
    (x, y)
  }

  /** beta = (X'X)⁻¹ X'y on embeddings vs label — the reference's L2
    * sample workload (sample02_L2.pdml). Hash-checked against
    * [[laL2FitSql]], the same elimination unrolled in SQL.
    */
  def laL2Fit(spark: SparkSession, d: String): DataFrame = {
    val (x, y) = l2Matrices(spark, d)
    MlWorkloads.l2Fit(x, y).toCells.toDF("i", "j", "v")
      .select(col("i"), col("j"), round(col("v"), 6).as("v"))
  }

  /** Oracle for [[laL2Fit]]: the normal equations assembled as an
    * augmented (64×65) cell table — gram X'X plus X'y as column 64 — and
    * the natural-order Gauss-Jordan elimination unrolled as 64 chained
    * CTEs. Step k mirrors [[graft.la.Kernels.solveAugmented]]'s IEEE op
    * sequence exactly: row k becomes a_kj/p, every other row becomes
    * a_ij − a_ik·(a_kj/p), all reads from the pre-step table. Betas are
    * column 64 after the last step, rounded to 1e-6 on both sides.
    */
  val laL2FitSql: String = {
    val d = 64
    val base =
      s"""WITH s0 AS MATERIALIZED (
         |  SELECT gi.i - 1 AS i, gj.j - 1 AS j,
         |    SUM(CAST(e.embedding[gi.i] AS DOUBLE) * CAST(e.embedding[gj.j] AS DOUBLE)) AS v
         |  FROM embeddings e, generate_series(1,$d) gi(i), generate_series(1,$d) gj(j)
         |  GROUP BY 1, 2
         |  UNION ALL
         |  SELECT gi.i - 1 AS i, $d AS j,
         |    SUM(CAST(e.embedding[gi.i] AS DOUBLE) * CAST(e.label AS DOUBLE)) AS v
         |  FROM embeddings e, generate_series(1,$d) gi(i)
         |  GROUP BY 1, 2)""".stripMargin
    val steps = (0 until d).map { k =>
      val prev = s"s$k"
      s"""s${k + 1} AS MATERIALIZED (
         |  SELECT c.i, c.j,
         |    CASE WHEN c.i = $k THEN c.v / p.v
         |         ELSE c.v - ak.v * (kr.v / p.v) END AS v
         |  FROM $prev c
         |  JOIN $prev p ON p.i = $k AND p.j = $k
         |  JOIN $prev kr ON kr.i = $k AND kr.j = c.j
         |  JOIN $prev ak ON ak.i = c.i AND ak.j = $k)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"\nSELECT CAST(i AS BIGINT) AS i, CAST(0 AS BIGINT) AS j, " +
      s"round(v, 6) AS v FROM s$d WHERE j = $d"
  }

  /** Normal-equation residual of the L2 fit: ‖X'X·β − X'y‖∞ rounded — an
    * oracle-checkable invariant of the solver (≈0 by construction), the
    * same pattern as la_inverse_check; complements la_l2_fit's
    * value-exact hash check.
    */
  def laL2Check(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val (x, y) = l2Matrices(spark, d)
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

  /** Oracle for [[mlLstm]]: the LSTM inference written out as a recursive
    * CTE. hidden=4, inDim=1, so each step's 4 gates per unit are explicit
    * arithmetic over the 8 carried state columns (h1..h4, c1..c4); the
    * formula-seeded weights are inlined as shortest-round-trip double
    * literals, and every affine sum keeps the kernel's left-to-right
    * association (bias + input term + recurrent terms in unit order).
    */
  val mlLstmSql: String = {
    val hidden = 4
    def arr(n: Int, seed: Int) =
      Array.tabulate(n)(i => math.sin(i + seed) * 0.5)
    val (wi, ui, bi) = (arr(hidden, 1), arr(hidden * hidden, 2), arr(hidden, 3))
    val (wf, uf, bf) = (arr(hidden, 4), arr(hidden * hidden, 5), arr(hidden, 6))
    val (wo, uo, bo) = (arr(hidden, 7), arr(hidden * hidden, 8), arr(hidden, 9))
    val (wc, uc, bc) = (arr(hidden, 10), arr(hidden * hidden, 11), arr(hidden, 12))
    def lit(d: Double) = {
      val s = java.lang.Double.toString(d)
      if (s.startsWith("-")) s"($s)" else s
    }
    // b(j) + w(j)·x + Σᵢ u(j·4+i)·hᵢ, left-associated like the kernel
    def affine(w: Array[Double], u: Array[Double], b: Array[Double], j: Int) =
      s"${lit(b(j))} + ${lit(w(j))} * e.value" +
        (0 until hidden).map(i => s" + ${lit(u(j * hidden + i))} * s.h${i + 1}").mkString
    def sig(x: String) = s"(1.0 / (1.0 + exp(-($x))))"
    // DuckDB 1.0 has no tanh(); the stable exp form saturates correctly
    // at ±1 and stays within libm-level drift of Math.tanh
    def tanhS(x: String) = s"(1.0 - 2.0 / (exp(2.0 * ($x)) + 1.0))"
    def cNew(j: Int) =
      s"(${sig(affine(wf, uf, bf, j))} * s.c${j + 1} + " +
        s"${sig(affine(wi, ui, bi, j))} * ${tanhS(affine(wc, uc, bc, j))})"
    def hNew(j: Int) =
      s"(${sig(affine(wo, uo, bo, j))} * ${tanhS(cNew(j))})"
    val stateCols = (0 until hidden).map(j => s"${hNew(j)} AS h${j + 1}") ++
      (0 until hidden).map(j => s"${cNew(j)} AS c${j + 1}")
    s"""WITH RECURSIVE
       |ev AS (
       |  SELECT user_id, CAST(value AS DOUBLE) AS value,
       |    -- millisecond (not microsecond) ordering: the Scala side sorts
       |    -- by Timestamp.getTime, which truncates to millis
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |                       ORDER BY epoch_ms(ts), value) AS step
       |  FROM events),
       |ln AS (SELECT user_id, COUNT(*) AS len FROM ev GROUP BY 1),
       |st(user_id, step, h1, h2, h3, h4, c1, c2, c3, c4) AS (
       |  SELECT user_id, CAST(0 AS BIGINT),
       |    CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
       |    CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE) FROM ln
       |  UNION ALL
       |  SELECT s.user_id, s.step + 1,
       |    ${stateCols.mkString(",\n    ")}
       |  FROM st s JOIN ev e ON e.user_id = s.user_id AND e.step = s.step + 1)
       |SELECT st.user_id, round((((h1 + h2) + h3) + h4) / 4, 6) AS score
       |FROM st JOIN ln ON st.user_id = ln.user_id WHERE st.step = ln.len""".stripMargin
  }

  /** Oracle for [[mlGmm]]: diagonal-covariance EM unrolled — per
    * iteration: log-density E-step with max-shift softmax, sufficient
    * statistics, clamped M-step (greatest() mirrors the kernel's
    * math.max floors); final hard assignment with first-max tiebreak.
    * 2π is inlined as its exact double so both engines run the same
    * log argument.
    */
  val mlGmmSql: String = {
    val iters = 3
    val twoPi = "6.283185307179586"
    val base =
      """WITH e AS (
        |  SELECT vec_id AS r, g.i - 1 AS j, CAST(embedding[g.i] AS DOUBLE) AS x
        |  FROM embeddings, generate_series(1, 64) g(i)),
        |w0 AS (SELECT k AS c, CAST(0.25 AS DOUBLE) AS w FROM generate_series(0, 3) t(k)),
        |m0 AS (
        |  SELECT vec_id AS c, g.i - 1 AS j, CAST(embedding[g.i] AS DOUBLE) AS mu,
        |    CAST(1.0 AS DOUBLE) AS vr
        |  FROM embeddings, generate_series(1, 64) g(i) WHERE vec_id < 4)""".stripMargin
    def logp(mPrev: String, wPrev: String, name: String) =
      s"""$name AS (
         |  SELECT e.r, m.c, ln(any_value(w.w)) + SUM(
         |    -0.5 * (ln($twoPi * m.vr) + (e.x - m.mu) * (e.x - m.mu) / m.vr)) AS lp
         |  FROM e JOIN $mPrev m ON e.j = m.j JOIN $wPrev w ON w.c = m.c
         |  GROUP BY e.r, m.c)""".stripMargin
    val steps = (1 to iters).map { t =>
      s"""${logp(s"m${t - 1}", s"w${t - 1}", s"lp$t")},
         |resp$t AS (
         |  SELECT r, c, p / SUM(p) OVER (PARTITION BY r) AS resp FROM (
         |    SELECT r, c, exp(lp - MAX(lp) OVER (PARTITION BY r)) AS p
         |    FROM lp$t) q$t),
         |rs$t AS (SELECT c, SUM(resp) AS rs FROM resp$t GROUP BY c),
         |xs$t AS (
         |  SELECT p.c, e.j, SUM(p.resp * e.x) AS xs, SUM(p.resp * e.x * e.x) AS x2s
         |  FROM resp$t p JOIN e ON p.r = e.r GROUP BY p.c, e.j),
         |w$t AS (
         |  SELECT c, rs / (SELECT SUM(rs) FROM rs$t) AS w FROM rs$t),
         |m$t AS (
         |  SELECT x.c, x.j, x.xs / greatest(r.rs, 1e-12) AS mu,
         |    greatest(x.x2s / greatest(r.rs, 1e-12) -
         |      (x.xs / greatest(r.rs, 1e-12)) * (x.xs / greatest(r.rs, 1e-12)),
         |      1e-6) AS vr
         |  FROM xs$t x JOIN rs$t r ON x.c = r.c)""".stripMargin
    }
    val fin =
      s"""${logp(s"m$iters", s"w$iters", "flp")}
         |SELECT CAST(c AS INT) AS component, COUNT(*) AS n FROM (
         |  SELECT r, c, ROW_NUMBER() OVER (PARTITION BY r ORDER BY lp DESC, c) AS rk
         |  FROM flp) z WHERE rk = 1 GROUP BY 1""".stripMargin
    (Seq(base) ++ steps :+ fin).mkString(",\n")
  }

  /** Oracle for [[mlLda]]: the PLSA EM unrolled — deterministic sin-seeded
    * init over sorted word indices and per-doc id residues, per-(doc,word) topic
    * responsibilities, column-normalized φ and row-normalized θ per
    * iteration, final φ rounded to 1e-6 like the kernel.
    */
  val mlLdaSql: String = {
    val iters = 5
    val topics = 3
    val base =
      s"""WITH counts AS (
         |  SELECT doc_id AS d, word, COUNT(*) AS cnt FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) u
         |  GROUP BY 1, 2),
         |wi AS (
         |  SELECT word, ROW_NUMBER() OVER (ORDER BY word) - 1 AS w
         |  FROM (SELECT DISTINCT word FROM counts) x),
         |di AS (
         |  SELECT d, d % 1000003 AS dI
         |  FROM (SELECT DISTINCT d FROM counts) x),
         |phiraw AS (
         |  SELECT wi.word, wi.w, t.t,
         |    0.5 + 0.5 * abs(sin(CAST(wi.w * 31 + t.t * 17 AS DOUBLE))) AS v
         |  FROM wi, generate_series(0, ${topics - 1}) t(t)),
         |phi0 AS (
         |  SELECT word, w, t, v / SUM(v) OVER (PARTITION BY t) AS v FROM phiraw),
         |thraw AS (
         |  SELECT di.d, di.dI, t.t,
         |    0.5 + 0.5 * abs(sin(CAST((di.dI + 7) * 31 + t.t * 17 AS DOUBLE))) AS v
         |  FROM di, generate_series(0, ${topics - 1}) t(t)),
         |th0 AS (
         |  SELECT d, dI, t, v / SUM(v) OVER (PARTITION BY d) AS v FROM thraw)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""resp$i AS (
         |  SELECT c.d, p.word, p.w, p.t,
         |    c.cnt * (p.v * th.v) / SUM(p.v * th.v) OVER (PARTITION BY c.d, p.w) AS r
         |  FROM counts c
         |  JOIN phi${i - 1} p ON p.word = c.word
         |  JOIN th${i - 1} th ON th.d = c.d AND th.t = p.t),
         |phia$i AS (SELECT word, w, t, SUM(r) AS v FROM resp$i GROUP BY 1, 2, 3),
         |phi$i AS (
         |  SELECT word, w, t, v / SUM(v) OVER (PARTITION BY t) AS v FROM phia$i),
         |tha$i AS (SELECT d, t, SUM(r) AS v FROM resp$i GROUP BY 1, 2),
         |th$i AS (
         |  SELECT a.d, di.dI, a.t, a.v / SUM(a.v) OVER (PARTITION BY a.d) AS v
         |  FROM tha$i a JOIN di ON di.d = a.d)""".stripMargin
    }
    val fin =
      s"""SELECT word, CAST(t AS INT) AS topic, round(v, 6) AS phi
         |FROM phi$iters""".stripMargin
    (Seq(base) ++ steps).mkString(",\n") + "\n" + fin
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
    "la_l2_fit" -> laL2FitSql,
    "dd_topk_jaccard" -> ddTopkJaccardSql,
    "ml_pagerank" -> mlPageRankSql,
    "ml_ff_inference" -> mlFfInferenceSql,
    "ml_lstm_scores" -> mlLstmSql,
    "ml_gmm" -> mlGmmSql,
    "ml_lda_topics" -> mlLdaSql,
    "la_l2_check" -> laL2CheckSql)
}
