package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining iterative ML workloads from the reference corpus: GMM
  * (reference: src/tests/source/TestGmmLazy.cc), LDA-style topic model
  * (TestLDA.cc), LSTM cell (src/sharedLibraries LSTM kernels). All follow
  * the reference's execution shape — client-side iteration, each step a
  * distributed pass (SURVEY.md §2.6) — with deterministic initialization
  * (no RNG, so results are reproducible run-to-run).
  */
object MlWorkloads2 {

  // ---------------- GMM (diagonal covariance, EM) ----------------

  final case class GmmModel(
      weights: Array[Double],         // K
      means: Array[Array[Double]],    // K × d
      vars: Array[Array[Double]])     // K × d (diagonal)

  /** EM for a diagonal-covariance Gaussian mixture. E+M fused into one
    * distributed pass per iteration: mapPartitions emits per-partition
    * sufficient statistics (resp sums, weighted x, weighted x²), reduced to
    * the driver (K·d doubles — tiny), which closes the loop. Deterministic
    * init: first K vectors as means, unit variance, uniform weights.
    */
  def gmmFit(
      data: Dataset[(Long, Array[Double])], k: Int, iterations: Int): GmmModel = {
    val spark = data.sparkSession
    val first = data.orderBy(col("_1")).limit(k).collect().map(_._2)
    val d = first(0).length
    var model = GmmModel(
      Array.fill(k)(1.0 / k),
      first.map(_.clone()),
      Array.fill(k)(Array.fill(d)(1.0)))

    implicit val statsEnc = Encoders.kryo(
      scala.reflect.ClassTag(classOf[(Array[Double], Array[Array[Double]], Array[Array[Double]])])
        .asInstanceOf[scala.reflect.ClassTag[(Array[Double], Array[Array[Double]], Array[Array[Double]])]])

    for (_ <- 1 to iterations) {
      val bc = spark.sparkContext.broadcast(model)
      val stats = data.mapPartitions { rows =>
        val m = bc.value
        val rs = Array.fill(k)(0.0)
        val xs = Array.fill(k)(new Array[Double](d))
        val x2s = Array.fill(k)(new Array[Double](d))
        rows.foreach { case (_, x) =>
          val logp = Array.tabulate(k) { c =>
            var acc = math.log(m.weights(c))
            var j = 0
            while (j < d) {
              val diff = x(j) - m.means(c)(j)
              acc += -0.5 * (math.log(2 * math.Pi * m.vars(c)(j)) +
                diff * diff / m.vars(c)(j))
              j += 1
            }
            acc
          }
          val mx = logp.max
          val probs = logp.map(lp => math.exp(lp - mx))
          val z = probs.sum
          var c = 0
          while (c < k) {
            val r = probs(c) / z
            rs(c) += r
            var j = 0
            while (j < d) {
              xs(c)(j) += r * x(j); x2s(c)(j) += r * x(j) * x(j); j += 1
            }
            c += 1
          }
        }
        Iterator.single((rs, xs, x2s))
      }.reduce { (a, b) =>
        var c = 0
        while (c < k) {
          a._1(c) += b._1(c)
          var j = 0
          while (j < d) { a._2(c)(j) += b._2(c)(j); a._3(c)(j) += b._3(c)(j); j += 1 }
          c += 1
        }
        a
      }
      val (rs, xs, x2s) = stats
      val total = rs.sum
      model = GmmModel(
        rs.map(_ / total),
        Array.tabulate(k)(c => xs(c).map(_ / math.max(rs(c), 1e-12))),
        Array.tabulate(k) { c =>
          Array.tabulate(d) { j =>
            val mu = xs(c)(j) / math.max(rs(c), 1e-12)
            math.max(x2s(c)(j) / math.max(rs(c), 1e-12) - mu * mu, 1e-6)
          }
        })
      bc.destroy()
    }
    model
  }

  /** hard-assign each vector to its most probable component */
  def gmmAssign(
      data: Dataset[(Long, Array[Double])], model: GmmModel): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    data.map { case (id, x) =>
      val m = bc.value
      val k = m.weights.length
      val best = (0 until k).maxBy { c =>
        var acc = math.log(m.weights(c))
        var j = 0
        while (j < x.length) {
          val diff = x(j) - m.means(c)(j)
          acc += -0.5 * (math.log(2 * math.Pi * m.vars(c)(j)) +
            diff * diff / m.vars(c)(j))
          j += 1
        }
        acc
      }
      (id, best)
    }.toDF("vec_id", "component")
  }

  // ---------------- LDA-style topic model (PLSA EM) ----------------

  /** PLSA-style EM over (doc, word, count) rows. φ (word-topic) and θ
    * (doc-topic) are driver-side (vocab and doc counts are bounded here;
    * at scale θ would live in a DataFrame keyed by doc and the join below
    * becomes a shuffle join — same pass structure). Deterministic init from
    * hash(word/doc, topic). Returns the word-topic matrix as rows.
    */
  def ldaFit(
      docWordCounts: Dataset[(Long, String, Long)], nTopics: Int,
      iterations: Int): DataFrame = {
    val spark = docWordCounts.sparkSession
    import spark.implicits._
    val rows = docWordCounts.collect() // bounded: |vocab| × |docs| pairs present
    val words = rows.map(_._2).distinct.sorted
    val docs = rows.map(_._1).distinct.sorted
    val wIdx = words.zipWithIndex.toMap
    val dIdx = docs.zipWithIndex.toMap

    def detInit(a: Int, b: Int): Double =
      0.5 + 0.5 * math.abs(math.sin(a * 31 + b * 17))
    var phi = Array.tabulate(words.length, nTopics)((w, t) => detInit(w, t))
    var theta = Array.tabulate(docs.length, nTopics)((d, t) => detInit(d + 7, t))
    normalizeCols(phi)
    normalizeRows(theta)

    for (_ <- 1 to iterations) {
      val phiAcc = Array.fill(words.length, nTopics)(0.0)
      val thetaAcc = Array.fill(docs.length, nTopics)(0.0)
      rows.foreach { case (doc, word, cnt) =>
        val w = wIdx(word)
        val dI = dIdx(doc)
        val p = Array.tabulate(nTopics)(t => phi(w)(t) * theta(dI)(t))
        val z = p.sum
        var t = 0
        while (t < nTopics) {
          val r = cnt * p(t) / z
          phiAcc(w)(t) += r
          thetaAcc(dI)(t) += r
          t += 1
        }
      }
      phi = phiAcc
      theta = thetaAcc
      normalizeCols(phi)
      normalizeRows(theta)
    }
    words.indices.flatMap { w =>
      (0 until nTopics).map(t => (words(w), t, math.rint(phi(w)(t) * 1e6) / 1e6))
    }.toDF("word", "topic", "phi")
  }

  private def normalizeCols(m: Array[Array[Double]]): Unit = {
    val nT = m(0).length
    var t = 0
    while (t < nT) {
      var s = 0.0
      m.foreach(r => s += r(t))
      if (s > 0) m.foreach(r => r(t) /= s)
      t += 1
    }
  }

  private def normalizeRows(m: Array[Array[Double]]): Unit =
    m.foreach { r =>
      val s = r.sum
      if (s > 0) { var t = 0; while (t < r.length) { r(t) /= s; t += 1 } }
    }

  // ---------------- LSTM cell (inference kernel) ----------------

  final case class LstmWeights(
      wi: Array[Double], ui: Array[Double], bi: Array[Double],
      wf: Array[Double], uf: Array[Double], bf: Array[Double],
      wo: Array[Double], uo: Array[Double], bo: Array[Double],
      wc: Array[Double], uc: Array[Double], bc: Array[Double],
      inDim: Int, hidden: Int)

  private def sigmoid(x: Double) = 1.0 / (1.0 + math.exp(-x))

  /** one LSTM step: gates = σ/tanh(W x + U h + b) */
  def lstmStep(
      w: LstmWeights, x: Array[Double], h: Array[Double], c: Array[Double])
      : (Array[Double], Array[Double]) = {
    val hN = w.hidden
    def affine(wm: Array[Double], um: Array[Double], b: Array[Double], j: Int): Double = {
      var acc = b(j)
      var i = 0
      while (i < w.inDim) { acc += wm(j * w.inDim + i) * x(i); i += 1 }
      i = 0
      while (i < hN) { acc += um(j * hN + i) * h(i); i += 1 }
      acc
    }
    val cNew = new Array[Double](hN)
    val hNew = new Array[Double](hN)
    var j = 0
    while (j < hN) {
      val ig = sigmoid(affine(w.wi, w.ui, w.bi, j))
      val fg = sigmoid(affine(w.wf, w.uf, w.bf, j))
      val og = sigmoid(affine(w.wo, w.uo, w.bo, j))
      val cand = math.tanh(affine(w.wc, w.uc, w.bc, j))
      cNew(j) = fg * c(j) + ig * cand
      hNew(j) = og * math.tanh(cNew(j))
      j += 1
    }
    (hNew, cNew)
  }

  /** batch-score sequences: each row = (id, sequence of input vectors);
    * partition-parallel map, no shuffle — the reference's LSTM inference
    * shape.
    */
  def lstmScore(
      seqs: Dataset[(Long, Array[Array[Double]])], w: LstmWeights): DataFrame = {
    val spark = seqs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(w)
    seqs.map { case (id, seq) =>
      val wts = bc.value
      var h = new Array[Double](wts.hidden)
      var c = new Array[Double](wts.hidden)
      seq.foreach { x =>
        val (h2, c2) = lstmStep(wts, x, h, c)
        h = h2; c = c2
      }
      (id, h.sum / wts.hidden) // pooled score
    }.toDF("id", "score")
  }
}
