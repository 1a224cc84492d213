package graft

import org.apache.spark.sql.functions._
import graft.la.BlockMatrix
import graft.operators.MlWorkloads

class MlSpec extends GraftSpecBase {

  test("PageRank: symmetric 2-cycle converges to equal ranks summing to n") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val ranks = MlWorkloads.pageRank(spark, edges, iterations = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks(1L) - 1.0) < 1e-9 && math.abs(ranks(2L) - 1.0) < 1e-9)
  }

  test("PageRank: rank mass is conserved and hubs outrank leaves") {
    import spark.implicits._
    // star: 1,2,3 all point at 4; 4 points at 1
    val edges = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val ranks = MlWorkloads.pageRank(spark, edges, iterations = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks.values.sum - 4.0) < 1e-6, s"mass ${ranks.values.sum}")
    assert(ranks(4L) > ranks(1L) && ranks(1L) > ranks(2L))
    assert(math.abs(ranks(2L) - ranks(3L)) < 1e-12, "symmetric leaves tie")
  }

  test("L2 fit solves the normal equations: X'X beta = X'y") {
    val x = BlockMatrix.fromLocal(spark,
      Array(1, 0, 0, 1, 1, 1, 2, 1, 1, 3, 2, 1), 4, 3, 2, 2)
    val y = BlockMatrix.fromLocal(spark, Array(1, 2, 5, 8), 4, 1, 2, 1)
    val beta = MlWorkloads.l2Fit(x, y)
    val lhs = x.gram.multiply(beta).toCells.collect()
      .map { case (i, _, v) => i -> v }.toMap
    val rhs = x.transpose.multiply(y).toCells.collect()
      .map { case (i, _, v) => i -> v }.toMap
    rhs.foreach { case (i, v) => assert(math.abs(lhs(i) - v) < 1e-9, s"row $i") }
  }
}
