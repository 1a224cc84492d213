package graft

import org.apache.spark.sql.functions._
import graft.operators.MlWorkloads2
import graft.operators.MlWorkloads2.LstmWeights

class Ml2Spec extends GraftSpecBase {

  test("GMM separates two well-separated clusters") {
    import spark.implicits._
    // cluster A around (0,0), cluster B around (10,10) — deterministic grid
    val pts = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0 else 10.0
      (i.toLong, Array(base + (i % 5) * 0.1, base + (i % 3) * 0.1))
    }
    val ds = spark.createDataset(pts)
    val model = MlWorkloads2.gmmFit(ds, k = 2, iterations = 10)
    val assign = MlWorkloads2.gmmAssign(ds, model)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val clusterOfEven = assign(0L)
    assert(pts.forall { case (id, _) =>
      if (id % 2 == 0) assign(id) == clusterOfEven else assign(id) != clusterOfEven
    }, s"assignments $assign")
  }

  test("LDA: topic distributions are normalized and deterministic") {
    import spark.implicits._
    val counts = Seq(
      (1L, "spark", 5L), (1L, "join", 3L),
      (2L, "cat", 4L), (2L, "dog", 4L),
      (3L, "spark", 2L), (3L, "cat", 2L)).toDS()
    val phi1 = MlWorkloads2.ldaFit(counts, nTopics = 2, iterations = 10).collect()
    val phi2 = MlWorkloads2.ldaFit(counts, nTopics = 2, iterations = 10).collect()
    assert(phi1.map(_.toSeq).toSeq == phi2.map(_.toSeq).toSeq, "deterministic")
    // each topic's word distribution sums to ~1
    val byTopic = phi1.groupBy(_.getInt(1)).view.mapValues(_.map(_.getDouble(2)).sum)
    byTopic.foreach { case (t, s) => assert(math.abs(s - 1.0) < 1e-3, s"topic $t sums $s") }
  }

  test("LDA vocabulary cap buckets the tail into OOV and keeps φ bounded") {
    import spark.implicits._
    val counts = Seq(
      (1L, "spark", 9L), (1L, "join", 8L), (2L, "spark", 7L),
      (2L, "rare1", 1L), (3L, "rare2", 1L), (3L, "join", 6L)).toDS()
    val phi = MlWorkloads2.ldaFit(counts, nTopics = 2, iterations = 5,
      maxVocab = 2).collect()
    val words = phi.map(_.getString(0)).toSet
    assert(words == Set("spark", "join", MlWorkloads2.OovToken),
      s"modeled vocab: $words")
    // φ is (maxVocab+1) × topics and each topic still normalizes
    assert(phi.length == 3 * 2)
    val byTopic = phi.groupBy(_.getInt(1)).view.mapValues(_.map(_.getDouble(2)).sum)
    byTopic.foreach { case (t, s) => assert(math.abs(s - 1.0) < 1e-3, s"topic $t sums $s") }
    // uncapped run on the same corpus models every word
    val full = MlWorkloads2.ldaFit(counts, nTopics = 2, iterations = 5).collect()
    assert(full.map(_.getString(0)).toSet ==
      Set("spark", "join", "rare1", "rare2"))
  }

  test("LSTM cell: gates bounded, state evolves, forgetting works") {
    def arr(n: Int, seed: Int) = Array.tabulate(n)(i => math.sin(i + seed) * 0.5)
    val h = 3
    val w = LstmWeights(
      arr(h, 1), arr(h * h, 2), arr(h, 3),
      arr(h, 4), arr(h * h, 5), arr(h, 6),
      arr(h, 7), arr(h * h, 8), arr(h, 9),
      arr(h, 10), arr(h * h, 11), arr(h, 12),
      inDim = 1, hidden = h)
    val (h1, c1) = MlWorkloads2.lstmStep(w, Array(1.0), new Array[Double](h), new Array[Double](h))
    val (h2, c2) = MlWorkloads2.lstmStep(w, Array(-1.0), h1, c1)
    assert(h1.forall(v => v.abs <= 1.0) && h2.forall(v => v.abs <= 1.0))
    assert(h1.toSeq != h2.toSeq, "state must evolve")
    // determinism
    val (h1b, _) = MlWorkloads2.lstmStep(w, Array(1.0), new Array[Double](h), new Array[Double](h))
    assert(h1.toSeq == h1b.toSeq)
  }
}
