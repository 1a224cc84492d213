package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.model.Tables
import graft.operators.RangeJoin
import graft.queries.ExtendedQueries

/** Extended-capability operators: banded range join, shingle expression
  * semantics, grouping sets, stats aggregates, sketch bounds, kmeans,
  * funnel/retention/mixing.
  */
class ExtendedSpec extends GraftSpecBase {

  test("funnel binds stages first-touch and strictly after the prior stage") {
    import spark.implicits._
    def t(m: Long) = new java.sql.Timestamp(1704067200000L + m * 60000L)
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", t(0)), (1L, "click", t(10)), (1L, "purchase", t(20)),
      // user 2: click BEFORE view, no click after → stops at view
      (2L, "click", t(0)), (2L, "view", t(5)), (2L, "purchase", t(9)),
      // user 3: view only
      (3L, "view", t(0)),
      // user 4: click at the SAME instant as view — strictly-after
      // semantics must not count it
      (4L, "view", t(0)), (4L, "click", t(0)))
      .toDF("user_id", "event_type", "ts")
    val got = graft.operators.EventAnalytics
      .funnel(ev, "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "view", 4L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("retention cohorts by first epoch week and counts return visits") {
    import spark.implicits._
    val week = 604800L * 1000
    def t(w: Long) = new java.sql.Timestamp(2800L * week + w * week + 1000L)
    val ev = Seq(
      (1L, t(0)), (1L, t(0)), (1L, t(2)), // user 1: week 0 and week 2
      (2L, t(0)),                         // user 2: week 0 only
      (3L, t(1)))                         // user 3: cohort week 1
      .toDF("user_id", "ts")
    val got = graft.operators.EventAnalytics.retention(ev, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (2800L, 0L) -> 2L, (2800L, 2L) -> 1L, (2801L, 0L) -> 1L))
  }

  test("mixByWeights honors quotas, short strata, and unweighted strata") {
    import spark.implicits._
    val df = ((1 to 8).map(i => (i.toLong, "a")) ++
      Seq((100L, "b"), (101L, "b")) ++
      Seq((200L, "c"))).toDF("id", "g")
    val out = graft.operators.Sampling
      .mixByWeights(df, col("g"), col("id"), Map("a" -> 0.5, "b" -> 0.5), 8)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byG = out.groupBy(_._2).view.mapValues(_.length).toMap
    // quota 4 each; b only has 2 rows (under-sampled stratum keeps all);
    // c carries no weight and is dropped
    assert(byG == Map("a" -> 4, "b" -> 2), s"got $byG")
  }

  test("merge upsert applies I/U/D and leaves untouched keys alone") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq((2L, "B", "U"), (3L, "c", "D"), (4L, "d", "I"))
      .toDF("k", "v", "op")
    val out = graft.operators.MergeOps.applyChanges(base, changes, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("bloom-pruned semi join == plain semi join on the fixture") {
    val orders = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val pruned = graft.operators.JoinPruning
      .bloomSemiJoin(li, orders, "l_orderkey", expectedKeys = 1000L)
      .collect().map(_.toSeq).toSet
    val plain = li.join(orders, Seq("l_orderkey"), "left_semi")
      .collect().map(_.toSeq).toSet
    assert(pruned == plain && pruned.nonEmpty)
  }

  test("weighted sample: exactly k rows, rerun-stable, weight-biased") {
    import spark.implicits._
    // weight 1000 vs 1: the heavy half must dominate the sample
    val rows = (1L to 400L).map(i =>
      (i, if (i % 2 == 0) 1000.0 else 1.0)).toDF("id", "w")
    val s1 = graft.operators.Sampling.weightedSample(rows, col("id"), col("w"), 40)
      .collect().map(_.getLong(0)).toSeq
    val s2 = graft.operators.Sampling.weightedSample(rows, col("id"), col("w"), 40)
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2)
    assert(s1.length == 40)
    assert(s1.count(_ % 2 == 0) >= 35, s"heavy-weight rows: ${s1.count(_ % 2 == 0)}")
  }

  test("z-order: kernel bits, box containment, disjoint cluster ranges") {
    import spark.implicits._
    import graft.functions.ZOrderKernel.interleave
    // x=5 (101) -> even bits 0,4; y=3 (011) -> odd bits 1,3: z = 27
    assert(interleave(5L, 3L) == 27L)
    assert(interleave(0L, 0L) == 0L)
    // every point of a box has z within [z(lo,lo), z(hi,hi)]
    val (xLo, xHi, yLo, yHi) = (6L, 21L, 9L, 30L)
    for (x <- xLo to xHi; y <- yLo to yHi) {
      val z = interleave(x, y)
      assert(z >= interleave(xLo, yLo) && z <= interleave(xHi, yHi),
        s"($x,$y) -> $z escapes the box z-interval")
    }
    // zBoxFilter == plain box filter on the fixture
    val li = Tables.lineitem(spark, sfDir)
    val viaZ = graft.operators.Layout
      .zBoxFilter(li, "l_partkey", "l_suppkey", 10L, 80L, 5L, 40L)
      .agg(count(lit(1))).head().getLong(0)
    val plain = li.filter(col("l_partkey").between(10, 80) &&
        col("l_suppkey").between(5, 40))
      .agg(count(lit(1))).head().getLong(0)
    assert(viaZ == plain && plain > 0)
    // out-of-domain bounds (negative / >= 2^31) skip the z pre-filter but
    // still return the exact box — truncated interleave must never drop rows
    val viaZNeg = graft.operators.Layout
      .zBoxFilter(li, "l_partkey", "l_suppkey", -5L, 80L, 5L, 1L << 40)
      .agg(count(lit(1))).head().getLong(0)
    val plainNeg = li.filter(col("l_partkey").between(-5, 80) &&
        col("l_suppkey").between(5L, 1L << 40))
      .agg(count(lit(1))).head().getLong(0)
    assert(viaZNeg == plainNeg && plainNeg > 0)
    // clustered partitions cover disjoint z-ranges
    val pts = (0L until 1000L).map(i => (i % 37, i % 53)).toDF("x", "y")
    val ranges = graft.operators.Layout.zorderCluster(pts, "x", "y", 4)
      .select(graft.functions.ZOrderExpressions.zValue(
        col("x").cast("long"), col("y").cast("long")).as("z"))
      .as[Long].mapPartitions(it => {
        val s = it.toSeq
        if (s.isEmpty) Iterator.empty else Iterator((s.min, s.max))
      }).collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("banded range join == naive inequality join") {
    import spark.implicits._
    val points = Seq((1L, -5.0), (2L, 0.0), (3L, 9.99), (4L, 10.0),
      (5L, 25.0), (6L, 99.9)).toDF("id", "v")
    val intervals = Seq((10L, -10.0, 0.0), (20L, 0.0, 10.0), (30L, 5.0, 30.0),
      (40L, 10.0, 10.0), (50L, 90.0, 200.0)).toDF("iid", "lo", "hi")
    val banded = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 7.0)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive)
    assert(naive.contains((2L, 20L)) && !naive.contains((2L, 10L))) // half-open
  }

  test("native word shingles match the HOF formulation") {
    import spark.implicits._
    // NOTE: docs with fewer words than n are excluded from the HOF
    // comparison — the old nested-HOF form ERRORS there (sequence(1,0)
    // yields a descending [1,0] and slice rejects start 0); the native
    // expression returns [] instead, asserted separately below.
    val docs = Seq("a b c d", "a a a", "p q  r").toDF("text")
    val native = docs.select(TextFunctions.wordShingles(col("text"), 2))
      .collect().map(_.getSeq[String](0).toList).toList
    val hof = docs.select(
      array_distinct(transform(
        sequence(lit(1), greatest(size(split(col("text"), " ")) - 1, lit(0))),
        i => concat_ws(" ", slice(split(col("text"), " "), i, lit(2))))))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(native == hof)
    assert(native.head == List("a b", "b c", "c d"))
    val short = Seq("x").toDF("text")
      .select(TextFunctions.wordShingles(col("text"), 2))
      .collect().head.getSeq[String](0)
    assert(short.isEmpty) // fewer words than n → no shingles, no error
  }

  test("cube emits all four grouping-set combinations") {
    val out = ExtendedQueries.cube(spark, sfDir)
    val rows = out.collect()
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1))) // grand total
    assert(rows.exists(r => r.isNullAt(0) && !r.isNullAt(1))) // by status only
    val total = rows.filter(r => r.isNullAt(0) && r.isNullAt(1)).map(_.getLong(2)).sum
    assert(total == Tables.lineitem(spark, sfDir).count())
  }

  test("stats aggregates: corr in [-1,1], regression line consistent") {
    val r = ExtendedQueries.statsAgg(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val corr = row.getDouble(1)
      assert(corr >= -1.0 && corr <= 1.0)
      val slope = row.getDouble(4)
      val covar = row.getDouble(2)
      assert(slope * covar >= 0.0) // slope and covariance share sign
    }
  }

  test("approx distinct stays within the 5% bound on the fixture") {
    val rows = ExtendedQueries.approxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(2)))
  }

  test("histogram buckets cover all orders exactly once") {
    val n = ExtendedQueries.histogram(spark, sfDir)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(n == Tables.orders(spark, sfDir).count())
  }

  test("kmeans assigns every embedding to one of k clusters") {
    val rows = ExtendedQueries.kmeans(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.embeddings(spark, sfDir).count())
    assert(rows.forall { r => val c = r.getLong(0); c >= 0 && c < 4 })
  }

  test("hyperplane-LSH cosine dedup finds planted near-dups == brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(i => (i.toLong, vec()))
    // plant near-dups: ids 1000+i are tiny perturbations of ids i<10
    val dups = (0 until 10).map { i =>
      (1000L + i, base(i)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val lsh = graft.operators.Dedup
      .cosineLshPairs(emb, "vec_id", "embedding", threshold = 0.95)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.operators.Dedup
      .cosinePairs(emb, "vec_id", "embedding", threshold = 0.95)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 10) // every planted pair is a real near-dup
    assert(lsh == exact)
  }

  test("cosinePairs size gate refuses a corpus-sized input loudly") {
    val emb = graft.model.Tables.embeddings(spark, sfDir)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup
        .cosinePairs(emb, "vec_id", "embedding", threshold = 0.95,
          maxRows = 10)
        .count()
    }
    // the failure must point callers at the scale paths, not just refuse
    assert(e.getMessage.contains("cosineLshPairs") &&
      e.getMessage.contains("semanticPairs"))
    // fixture scale stays under the DEFAULT bound — dd_cosine_pairs and
    // this spec's planted-dup test are unaffected by the gate
    assert(emb.count() <= 100000L)
  }

  test("plan guards: banded range join is a hash join; selection pushes filters") {
    val rj = ExtendedQueries.rangeJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!rj.contains("CartesianProduct") && !rj.contains("BroadcastNestedLoopJoin"))
    val sel = graft.queries.OperatorQueries.selection(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(sel.contains("PushedFilters: [") && !sel.contains("PushedFilters: []"))
  }

  test("orc source round-trips a table") {
    val path = "/tmp/graft-test-orc"
    val df = Tables.nation(spark, sfDir)
    graft.sources.Sources.writeOrc(df, path)
    val back = graft.sources.Sources.readOrc(spark, path)
    assert(back.schema == df.schema)
    assert(back.count() == df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("stratified sampling: <= k per stratum, deterministic across runs") {
    import org.apache.spark.sql.functions.col
    val cust = Tables.customer(spark, sfDir)
    def run() = graft.operators.Sampling
      .stratified(cust, col("c_nationkey"), col("c_custkey"), k = 3)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val s1 = run()
    assert(s1 == run(), "same sample on rerun")
    val perStratum = graft.operators.Sampling
      .stratified(cust, col("c_nationkey"), col("c_custkey"), k = 3)
      .groupBy(col("c_nationkey")).count().collect().map(_.getLong(1))
    assert(perStratum.forall(_ <= 3) && perStratum.nonEmpty)
    // the hash order is not the id order — a real shuffle, not the k
    // smallest ids of each stratum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
    val idOrderPick = cust
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rk") <= 3)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(s1 != idOrderPick)
  }
}
