package graft

import graft.la.{BlockMatrix, Kernels, MatrixBlock, Pdml}

class LaSpec extends GraftSpecBase {

  test("kernel matmul matches hand computation") {
    val a = MatrixBlock(0, 0, 2, 3, Array(1, 2, 3, 4, 5, 6))
    val b = MatrixBlock(0, 0, 3, 2, Array(7, 8, 9, 10, 11, 12))
    assert(Kernels.matmul(a, b).toSeq == Seq(58.0, 64.0, 139.0, 154.0))
  }

  test("kernel transpose round-trips") {
    val m = MatrixBlock(1, 2, 2, 3, Array(1, 2, 3, 4, 5, 6))
    val t = Kernels.transpose(m)
    assert(t.blockRow == 2 && t.blockCol == 1 && t.rows == 3 && t.cols == 2)
    assert(Kernels.transpose(t).data.toSeq == m.data.toSeq)
  }

  test("kernel inverse: A * A^-1 = I") {
    val a = Array(4.0, 7.0, 2.0, 6.0)
    val inv = Kernels.inverse(2, a)
    val prod = Kernels.matmul(
      MatrixBlock(0, 0, 2, 2, a), MatrixBlock(0, 0, 2, 2, inv))
    assert(math.abs(prod(0) - 1) < 1e-12 && math.abs(prod(3) - 1) < 1e-12 &&
      math.abs(prod(1)) < 1e-12 && math.abs(prod(2)) < 1e-12)
  }

  test("pdml parser handles the full reference grammar") {
    val prog = Pdml.parse(
      """A = load(4,4,2,2,"data.mat")
        |B = zeros(4,4,2,2)
        |C = ones(4,4,2,2)
        |D = identity(4,2)
        |E = A + B
        |G = A * B
        |H = A '* B
        |I = A %*% B
        |J = A^T
        |K = A^-1
        |K = A + B%*%C
        |L = max(A)
        |N = rowMax(A)
        |P = rowSum(A)
        |S = colSum(A)
        |T = duplicateRow(A,2,2)
        |""".stripMargin)
    assert(prog.length == 16)
    assert(prog(10).e == Pdml.BinOp("+", Pdml.Ident("A"),
      Pdml.BinOp("%*%", Pdml.Ident("B"), Pdml.Ident("C"))),
      "multiplicative binds tighter than additive")
  }

  test("pdml end-to-end: distributed ops on small matrices") {
    val x = BlockMatrix.fromLocal(spark,
      Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12), 4, 3, 2, 2)
    val out = Pdml.run(spark,
      """G = X '* X
        |S = rowSum(X)
        |M = rowMax(X)
        |Y = (X + X) - X
        |D = duplicateRow(colSum(X), 4, 2)
        |""".stripMargin, Map("X" -> x))

    // gram: X'X for X = [[1,2,3],[4,5,6],[7,8,9],[10,11,12]]
    val g = out("G").toCells.collect().map { case (i, j, v) => ((i, j), v) }.toMap
    assert(g((0L, 0L)) == 166.0 && g((1L, 1L)) == 214.0 && g((0L, 2L)) == 210.0)
    val s = out("S").toCells.collect().map { case (i, _, v) => (i, v) }.toMap
    assert(s == Map(0L -> 6.0, 1L -> 15.0, 2L -> 24.0, 3L -> 33.0))
    val m = out("M").toCells.collect().map { case (i, _, v) => (i, v) }.toMap
    assert(m == Map(0L -> 3.0, 1L -> 6.0, 2L -> 9.0, 3L -> 12.0))
    val y = out("Y").toCells.collect().map { case (i, j, v) => ((i, j), v) }.toMap
    assert(y((3L, 2L)) == 12.0 && y((0L, 0L)) == 1.0)
    val d = out("D").toCells.collect().map { case (i, j, v) => ((i, j), v) }.toMap
    assert(d((0L, 0L)) == 22.0 && d((3L, 2L)) == 30.0, "colSum row duplicated")
  }

  test("distributed inverse: G %*% G^-1 = I") {
    val x = BlockMatrix.fromLocal(spark,
      Array(2, 1, 0, 1, 3, 1, 0, 1, 4, 1, 1, 1), 4, 3, 2, 2)
    val out = Pdml.run(spark, "P = (X '* X) %*% (X '* X)^-1", Map("X" -> x))
    val p = out("P").toCells.collect()
    p.foreach { case (i, j, v) =>
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(v - want) < 1e-9, s"P($i,$j)=$v")
    }
  }

  test("identity is a multiplicative no-op") {
    val x = BlockMatrix.fromLocal(spark, Array(1, 2, 3, 4, 5, 6), 2, 3, 2, 2)
    val out = Pdml.run(spark, "Y = X %*% identity(3, 2)", Map("X" -> x))
    val y = out("Y").toCells.collect().map { case (i, j, v) => ((i, j), v) }.toMap
    assert(y == Map((0L, 0L) -> 1.0, (0L, 1L) -> 2.0, (0L, 2L) -> 3.0,
      (1L, 0L) -> 4.0, (1L, 1L) -> 5.0, (1L, 2L) -> 6.0))
  }

  test("pdml rejects malformed programs") {
    intercept[IllegalArgumentException](Pdml.parse("A = load(1,2)"))
    intercept[IllegalArgumentException](Pdml.parse("= B"))
    intercept[IllegalArgumentException](Pdml.parse("A = B @ C"))
  }
}
