package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.la.{Kernels, MatrixBlock}

/** Pins the three matmul kernels (SIMD, scalar-tiled, naive ikj) to
  * elementwise-EXACT equality: the tiled/SIMD forms reorder loops and
  * memory traffic but never the per-element IEEE operation sequence
  * (ascending-k mul-then-add per output cell), so results must be
  * bit-identical on finite inputs — the property the unrolled SQL
  * oracles (la_*, la_l2_*) rely on.
  */
class KernelsSpec extends AnyFunSuite {

  private def mk(br: Int, bc: Int, rows: Int, cols: Int, seed: Int,
                 zeroEvery: Int = 0): MatrixBlock = {
    val rnd = new scala.util.Random(seed)
    val d = Array.fill(rows * cols)(rnd.nextDouble() * 2.0 - 1.0)
    if (zeroEvery > 0) {
      var i = 0
      while (i < d.length) { d(i) = 0.0; i += zeroEvery }
    }
    MatrixBlock(br, bc, rows, cols, d)
  }

  private def check(m: Int, k: Int, n: Int, zeroEvery: Int = 0): Unit = {
    val a = mk(0, 0, m, k, seed = m * 31 + k, zeroEvery)
    val b = mk(0, 0, k, n, seed = k * 17 + n)
    val naive = Kernels.matmulNaive(a, b)
    val scalar = Kernels.matmulScalar(a, b)
    val simd = Kernels.matmul(a, b)
    assert(scalar.sameElements(naive), s"scalar != naive at ${m}x${k}x$n")
    assert(simd.sameElements(naive), s"simd/dispatch != naive at ${m}x${k}x$n")
  }

  test("kernels agree bit-exactly across shapes, remainders, and chunk boundaries") {
    check(1, 1, 1)
    check(3, 5, 7)          // all-remainder rows, sub-vector width
    check(4, 8, 8)          // exact MI block, sub-vector n
    check(7, 13, 9)         // MI remainder + vector-tail j
    check(33, 130, 17)      // crosses the KC=128 chunk boundary
    check(64, 257, 40)      // chunk boundary + odd k
    check(10, 300, 65, zeroEvery = 3) // zero a-elements exercise skip paths
    // ODD m with zeros: the row-remainder path skips av == 0.0 while the
    // 2x4 register tile adds explicit +0.0 — without an odd-m zero shape
    // the remainder's zero-skip is never pinned by the bit-parity check
    check(33, 130, 17, zeroEvery = 3)
    check(7, 13, 9, zeroEvery = 2)
  }

  test("kernel agreement at a full fixture-like block") {
    check(96, 256, 96)
    check(100, 100, 100, zeroEvery = 7)
  }
}
