package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.la.{BlockMatrix, Pdml}

/** Linear-algebra DSL queries over the embeddings fixture, driven through
  * the pdml interpreter (EP2 in SURVEY.md §3) so the parser + block kernels
  * are exercised end-to-end. Results flatten to (i, j, v) cells for the
  * DuckDB oracle; v is rounded to 1e-6 because block-partial summation
  * order differs from the oracle's cell-order sum.
  */
object LaQueries {

  /** embeddings as an n×64 row matrix, 2-block-wide (32-col) blocking */
  private def matrixOf(spark: SparkSession, d: String): (BlockMatrix, Long) = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    val n = emb.count()
    val rows = emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    (BlockMatrix.fromRowVectors(spark, rows, n, 64, 256, 32), n)
  }

  private def cells(m: BlockMatrix): DataFrame =
    m.toCells.toDF("i", "j", "v")
      .select(col("i"), col("j"), round(col("v"), 6).as("v"))

  /** Gram matrix X'X via the pdml program `G = X '* X`
    * (reference: DSLSamples/sample01_Gram.pdml, kernels LASillyMultiply*.h).
    */
  def laGram(spark: SparkSession, d: String): DataFrame = {
    val (x, _) = matrixOf(spark, d)
    val out = Pdml.run(spark, "G = X '* X", Map("X" -> x))
    cells(out("G"))
  }

  val laGramSql: String =
    """SELECT CAST(gi.i-1 AS BIGINT) AS i, CAST(gj.j-1 AS BIGINT) AS j,
      | round(SUM(CAST(embedding[gi.i] AS DOUBLE)*CAST(embedding[gj.j] AS DOUBLE)), 6) AS v
      |FROM embeddings, generate_series(1,64) gi(i), generate_series(1,64) gj(j)
      |GROUP BY 1, 2""".stripMargin

  /** per-row sums via pdml rowSum() */
  def laRowSum(spark: SparkSession, d: String): DataFrame = {
    val (x, _) = matrixOf(spark, d)
    val out = Pdml.run(spark, "S = rowSum(X)", Map("X" -> x))
    cells(out("S"))
  }

  val laRowSumSql: String =
    """SELECT vec_id AS i, CAST(0 AS BIGINT) AS j,
      | round((SELECT SUM(CAST(embedding[k] AS DOUBLE))
      |        FROM generate_series(1,64) g(k)), 6) AS v
      |FROM embeddings""".stripMargin

  /** elementwise algebra identity X + X - X = X — exercises add/subtract
    * co-partitioned joins through the DSL
    */
  def laElementwise(spark: SparkSession, d: String): DataFrame = {
    val (x, _) = matrixOf(spark, d)
    val out = Pdml.run(spark, "Y = X + X - X", Map("X" -> x))
    cells(out("Y"))
  }

  val laElementwiseSql: String =
    """SELECT vec_id AS i, CAST(g.k-1 AS BIGINT) AS j,
      | round(CAST(embedding[g.k] AS DOUBLE), 6) AS v
      |FROM embeddings, generate_series(1,64) g(k)""".stripMargin

  /** per-column sums via pdml colSum() (transpose + rowSum + transpose) */
  def laColSum(spark: SparkSession, d: String): DataFrame = {
    val (x, _) = matrixOf(spark, d)
    val out = Pdml.run(spark, "S = colSum(X)", Map("X" -> x))
    cells(out("S"))
  }

  val laColSumSql: String =
    """SELECT CAST(0 AS BIGINT) AS i, CAST(g.k-1 AS BIGINT) AS j,
      | round(SUM(CAST(embedding[g.k] AS DOUBLE)), 6) AS v
      |FROM embeddings, generate_series(1,64) g(k)
      |GROUP BY 2""".stripMargin

  /** elementwise (Hadamard) product X * X via the DSL's scale-multiply */
  def laHadamard(spark: SparkSession, d: String): DataFrame = {
    val (x, _) = matrixOf(spark, d)
    val out = Pdml.run(spark, "Y = X * X", Map("X" -> x))
    cells(out("Y"))
  }

  val laHadamardSql: String =
    """SELECT vec_id AS i, CAST(g.k-1 AS BIGINT) AS j,
      | round(CAST(embedding[g.k] AS DOUBLE) * CAST(embedding[g.k] AS DOUBLE), 6) AS v
      |FROM embeddings, generate_series(1,64) g(k)""".stripMargin

  /** Dense multiply Y = X %*% W (n×64 · 64×8) — the baseline's headline
    * matrix-multiply anchor (reference: DSLSamples, LASillyMultiply*.h;
    * BASELINE.md's TensorFlow-comparison task) registered directly, in
    * the general `%*%` form with a non-square result (la_gram covers the
    * transpose-multiply `'*` special case). W is formula-seeded (sin of
    * the row-major index, like ml_ff_inference's weights) so the oracle
    * inlines bit-identical weights; the 64-wide inner product sums as two
    * 32-wide block partials, which the SQL mirrors exactly.
    */
  def laMultiply(spark: SparkSession, d: String): DataFrame = {
    val (x, _) = matrixOf(spark, d)
    val w = BlockMatrix.fromLocal(spark,
      Array.tabulate(64 * 8)(i => math.sin(i.toDouble)), 64, 8, 32, 8)
    val out = Pdml.run(spark, "Y = X %*% W", Map("X" -> x, "W" -> w))
    cells(out("Y"))
  }

  val laMultiplySql: String =
    """SELECT e.vec_id AS i, CAST(j AS BIGINT) AS j,
      | round(
      |  (SELECT SUM(CAST(e.embedding[k+1] AS DOUBLE) * sin(CAST(k*8+j AS DOUBLE)))
      |   FROM generate_series(0,31) g(k)) +
      |  (SELECT SUM(CAST(e.embedding[k+1] AS DOUBLE) * sin(CAST(k*8+j AS DOUBLE)))
      |   FROM generate_series(32,63) g(k)), 6) AS v
      |FROM embeddings e, generate_series(0,7) gj(j)""".stripMargin

  /** G %*% G^-1 = I — multiply + driver-gathered Gauss-Jordan inverse
    * (reference: LASillyInverse*.h gathers the full matrix too; SURVEY.md
    * §7.4 risk 5). Output: off-diagonal max |v|, diagonal max |v-1| —
    * both ~0; compared rounded so the oracle is a constant.
    */
  def laInverse(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val (x, _) = matrixOf(spark, d)
    val out = Pdml.run(spark, "P = (X '* X) %*% (X '* X)^-1", Map("X" -> x))
    val dev = out("P").toCells.map { case (i, j, v) =>
      if (i == j) math.abs(v - 1.0) else math.abs(v)
    }.reduce(math.max)
    spark.createDataset(Seq(math.round(dev * 1e6) / 1e6)).toDF("max_deviation")
  }

  val laInverseSql: String = "SELECT CAST(0.0 AS DOUBLE) AS max_deviation"

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "la_gram" -> laGram,
    "la_multiply" -> laMultiply,
    "la_rowsum" -> laRowSum,
    "la_colsum" -> laColSum,
    "la_hadamard" -> laHadamard,
    "la_elementwise" -> laElementwise,
    "la_inverse_check" -> laInverse)

  val oracles: Map[String, String] = Map(
    "la_gram" -> laGramSql,
    "la_multiply" -> laMultiplySql,
    "la_rowsum" -> laRowSumSql,
    "la_colsum" -> laColSumSql,
    "la_hadamard" -> laHadamardSql,
    "la_elementwise" -> laElementwiseSql,
    "la_inverse_check" -> laInverseSql)
}
