package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.TopKAggregator

/** Randomized invariants (seeded, deterministic) for the algebraic core. */
class PropertySpec extends GraftSpecBase {

  private val rnd = new Random(42)

  test("TopK heap: reduce-only == split-merge == sort.take, random inputs") {
    for (_ <- 1 to 50) {
      val xs = List.fill(rnd.nextInt(60) + 1)(rnd.nextDouble() * 2e6 - 1e6)
      val k = rnd.nextInt(10) + 1
      val agg = new TopKAggregator[Double](k, identity)
      val viaHeap = xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      val (l, r) = xs.splitAt(xs.length / 2)
      val viaMerge = agg.merge(
        l.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)),
        r.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
      val expect = xs.sorted(Ordering[Double].reverse).take(k)
      assert(agg.finish(viaHeap) == expect)
      assert(agg.finish(viaMerge) == expect)
    }
  }

  test("monoid AvgState: order-insensitive merge, correct mean") {
    import graft.operators.Monoids.AvgState
    for (_ <- 1 to 50) {
      val xs = List.fill(rnd.nextInt(40) + 1)(rnd.nextDouble() * 2e6 - 1e6)
      val states = xs.map(AvgState(_, 1L))
      val shuffled = rnd.shuffle(states).reduceLeft(_ + _)
      assert(shuffled.cnt == xs.length)
      assert(math.abs(shuffled.avg - xs.sum / xs.length) < 1e-6)
    }
  }

  test("jaccard: symmetric, bounded, 1 on self, random word sets") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val samples = (1 to 20).map { _ =>
      (List.fill(rnd.nextInt(5) + 1)(vocab(rnd.nextInt(vocab.size))).distinct,
        List.fill(rnd.nextInt(5) + 1)(vocab(rnd.nextInt(vocab.size))).distinct)
    }
    val rows = samples.toDF("a", "b").select(
      graft.functions.TextFunctions.jaccard(col("a"), col("b")).as("j1"),
      graft.functions.TextFunctions.jaccard(col("b"), col("a")).as("j2"),
      graft.functions.TextFunctions.jaccard(col("a"), col("a")).as("self"))
      .collect()
    rows.foreach { r =>
      val (j1, j2, self) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(j1 == j2 && j1 >= 0.0 && j1 <= 1.0 && self == 1.0)
    }
  }

  test("native DotProduct == hand fold on random double arrays") {
    import spark.implicits._
    val samples = (1 to 20).map { _ =>
      (Array.fill(rnd.nextInt(16) + 1)(rnd.nextDouble() * 2 - 1), 0)
    }.map { case (a, _) => (a, a.map(x => x * 0.5)) }
    val got = samples.toDF("a", "b")
      .select(graft.functions.VectorExpressions.dotNative(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    val want = samples.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("Kernels.transpose is an involution on random matrices") {
    import graft.la.{Kernels, MatrixBlock}
    for (_ <- 1 to 30) {
      val r = rnd.nextInt(6) + 1
      val c = rnd.nextInt(6) + 1
      val data = Array.fill(r * c)(rnd.nextDouble())
      val m = MatrixBlock(0, 0, r, c, data)
      assert(Kernels.transpose(Kernels.transpose(m)).data.toSeq == data.toSeq)
    }
  }

  test("banded range join == naive join on random points/intervals/widths") {
    import spark.implicits._
    for (trial <- 1 to 5) {
      val points = (0 until 60).map(i =>
        (i.toLong, rnd.nextDouble() * 200 - 100)).toDF("id", "v")
      val intervals = (0 until 25).map { i =>
        val lo = rnd.nextDouble() * 200 - 100
        (i.toLong, lo, lo + rnd.nextDouble() * 40)
      }.toDF("iid", "lo", "hi")
      val w = Seq(0.5, 3.0, 17.0, 100.0)(trial % 4)
      val banded = graft.operators.RangeJoin
        .pointInInterval(points, "v", intervals, "lo", "hi", w)
        .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = points.crossJoin(intervals)
        .filter(col("v") >= col("lo") && col("v") < col("hi"))
        .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == naive, s"trial $trial width $w")
    }
  }

  test("solveAugmented: A·x = b on random SPD systems") {
    for (trial <- 1 to 20) {
      val n = rnd.nextInt(8) + 2
      // SPD by construction: A = M'M + n·I
      val m = Array.fill(n * n)(rnd.nextDouble() * 2 - 1)
      val a = Array.tabulate(n * n) { idx =>
        val (i, j) = (idx / n, idx % n)
        (0 until n).map(k => m(k * n + i) * m(k * n + j)).sum +
          (if (i == j) n.toDouble else 0.0)
      }
      val b = Array.fill(n)(rnd.nextDouble() * 10 - 5)
      val aug = new Array[Double](n * (n + 1))
      for (i <- 0 until n) {
        System.arraycopy(a, i * n, aug, i * (n + 1), n)
        aug(i * (n + 1) + n) = b(i)
      }
      graft.la.Kernels.solveAugmented(n, n + 1, aug)
      val x = Array.tabulate(n)(i => aug(i * (n + 1) + n))
      for (i <- 0 until n) {
        val ax = (0 until n).map(j => a(i * n + j) * x(j)).sum
        assert(math.abs(ax - b(i)) < 1e-8, s"trial $trial row $i: $ax vs ${b(i)}")
      }
    }
  }

  test("duplicateSpans/stripDuplicateSpans == local reference on random corpora") {
    import spark.implicits._
    val k = 3
    for (trial <- 1 to 5) {
      // 4-word vocabulary forces plenty of shared k-grams
      val vocab = Vector("a", "b", "c", "d")
      val docs = (1L to (rnd.nextInt(6) + 4).toLong).map { id =>
        val len = rnd.nextInt(12) + 1
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val sites = for {
        (id, ts) <- toks.toSeq; p <- 0 to ts.length - k
      } yield (ts.slice(p, p + k).mkString(" "), id, p.toLong)
      val dupG = sites.groupBy(_._1).filter(_._2.size >= 2).keySet
      val dupSites = sites.filter(s => dupG(s._1))
      // reference spans: ascending-position islands per doc
      val wantSpans = dupSites.groupBy(_._2).flatMap { case (id, ss) =>
        val ps = ss.map(_._3).distinct.sorted
        val islands = ps.foldLeft(List.empty[List[Long]]) {
          case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 =>
            (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }
        islands.map(is =>
          (id, is.min, is.max + k - 1, is.max + k - 1 - is.min + 1))
      }.toSet
      val gotSpans = graft.operators.Dedup
        .duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(gotSpans == wantSpans, s"trial $trial docs $docs")
      // reference strip: remove the union of non-canonical dup windows
      val canon = dupSites.groupBy(_._1)
        .map { case (g, ss) => g -> ss.map(s => (s._2, s._3)).min }
      val removed = dupSites
        .filter(s => canon(s._1) != ((s._2, s._3)))
        .flatMap(s => (s._3 until s._3 + k).map(tp => (s._2, tp)))
        .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
      val wantStrip = toks.map { case (id, ts) =>
        val rem = removed.getOrElse(id, Set.empty[Long])
        val kept = ts.zipWithIndex.collect {
          case (t, i) if !rem(i.toLong) => t
        }
        (id, kept.mkString(" "), ts.length.toLong - kept.length)
      }.toSet
      val gotStrip = graft.operators.Dedup
        .stripDuplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(gotStrip == wantStrip, s"trial $trial docs $docs")
    }
  }

  test("stripDuplicateSpans null-id contract: pass-through, excluded from election") {
    // Declared degenerate-input contract (VERDICT r20 #1): a null-id
    // document cannot be attributed, so (1) it passes through UNTOUCHED
    // (clean_text = its text, n_removed = 0) rather than being stripped
    // to empty as pre-r20 code did, and (2) its window sites take no
    // part in duplicate detection or canonical-site election — a gram
    // shared only between a null-id doc and one real doc is NOT a
    // corpus duplicate.
    import spark.implicits._
    val docs = Seq[(java.lang.Long, String)](
      (1L, "a b c d e"),
      (2L, "a b c d e"), // verbatim dup of doc 1 → stripped to empty
      (null, "a b c d e"), // null id: same text, must pass through
      (3L, "p q r s t"),
      (null, "p q r s t") // gram shared ONLY with doc 3 → no dup
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .stripDuplicateSpans(docs, "doc_id", "text", k = 4)
      .collect()
      .map(r => (Option(r.get(0)), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      (Some(1L), "a b c d e", 0L), // canonical first site survives
      (Some(2L), "", 5L), // later copy stripped
      (None, "a b c d e", 0L), // null id untouched, even with dup text
      (Some(3L), "p q r s t", 0L), // null-id twin does not make a dup
      (None, "p q r s t", 0L)), got.toString)
  }

  test("exact md5-fingerprint grouping == full-key grouping, adversarial keys") {
    import spark.implicits._
    // The operator groups on unhex(md5(key)) instead of the key itself
    // (the 100 TB shuffle-byte cut); this pins that the fingerprint
    // grouping is observationally identical to full-key grouping on
    // keys BUILT to stress a weak hash: long shared prefixes/suffixes,
    // single-char flips deep inside, same bag of words reordered,
    // differing only in length, plus exact duplicates and nulls.
    val base = "x " * 3000
    val keys = Seq(
      base + "tail-one", base + "tail-two", // 6 KB shared prefix
      "head-one " + base, "head-two " + base, // shared suffix
      base + "a" + base, base + "b" + base, // flip mid-string
      base.trim, base.trim + " x", // prefix-of-the-other
      "a b", "b a", // reordered words
      "", " ", // empty vs blank
      null, null, // null keys: one group of 2
      base + "tail-one" // exact dup of the first
    )
    val docs = keys.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .exact(docs, col("text"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: group by the raw key locally
    val want = keys.zipWithIndex.groupBy(_._1)
      .map { case (_, g) => (g.map(_._2.toLong).min, g.size.toLong) }.toSet
    assert(got == want, s"md5 grouping diverged: got $got want $want")
  }

  test("domainTokenBudget is invariant under input partitioning, random corpora") {
    import spark.implicits._
    // the md5-keyed shuffle order is the whole point: the shipped
    // mixture must not depend on how the input happened to be laid out
    // (zipWithIndex-style ordering would silently fail this)
    for (trial <- 1 to 3) {
      val docs = (1L to (rnd.nextInt(40) + 20).toLong).map { i =>
        (i * 7 + trial, ("w " * (rnd.nextInt(9) + 1)).trim,
          Seq("a", "b", "c")(rnd.nextInt(3)))
      }.toDF("doc_id", "text", "lang")
      def run(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Curation.domainTokenBudget(
            df, "doc_id", "text", "lang",
            Map("a" -> 0.5, "b" -> 0.5), totalTokens = 60L, nShards = 2)
          .collect().map(_.toSeq).toSet
      val base = run(docs)
      assert(base == run(docs.repartition(7)),
        s"trial $trial: mixture changed under repartition(7)")
      assert(base == run(docs.orderBy(desc("doc_id")).coalesce(1)),
        s"trial $trial: mixture changed under reversed single-partition input")
    }
  }

  test("dupClusters == local union-find on random pair graphs") {
    import spark.implicits._
    for (trial <- 1 to 5) {
      val nNodes = rnd.nextInt(30) + 5
      val pairs = List.fill(rnd.nextInt(25) + 1) {
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2)
      if (pairs.nonEmpty) {
        val got = graft.operators.Dedup.dupClusters(pairs.toDF("id_a", "id_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        // reference: union-find with min-id representatives
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        val want = nodes.map(x => x -> find(x)).toMap
        assert(got == want, s"trial $trial pairs $pairs")
      }
    }
  }
}
