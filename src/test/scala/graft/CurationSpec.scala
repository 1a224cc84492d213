package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends GraftSpecBase {

  test("decontaminate flags exactly the docs sharing an n-gram with the bench set") {
    import spark.implicits._
    val bench = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "a quick brown fox appears"),   // shares "quick brown fox"
      (11L, "entirely different words here"), // clean
      (12L, "the quick brown fox jumps")    // verbatim copy: all 3 grams
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 1L, 12L -> 3L))
  }

  test("piiScan counts and redacts emails, IPs, and phones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a@b.com and c.d@e.org from 10.0.0.1 call 555-123-4567"),
      (2L, "no pii at all")).toDF("doc_id", "text")
    val rows = Curation.piiScan(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(rows(1L) == ((2, 1, 1,
      "mail [EMAIL] and [EMAIL] from [IP] call [PHONE]")))
    assert(rows(2L) == ((0, 0, 0, "no pii at all")))
  }

  test("chunkTokens covers every token, overlaps by chunkSize-stride, and keeps short docs whole") {
    import spark.implicits._
    // 50 tokens: w0 .. w49
    val text = (0 until 50).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "tiny doc")).toDF("doc_id", "text")
    val out = Curation.chunkTokens(docs, "doc_id", "text", chunkSize = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx").collect()
    val doc1 = out.filter(_.getLong(0) == 1L)
    // ceil((50-32)/24) = 1 → 2 chunks
    assert(doc1.length == 2)
    assert(doc1(0).getString(3) == (0 until 32).map(i => s"w$i").mkString(" "))
    assert(doc1(1).getString(3) == (24 until 50).map(i => s"w$i").mkString(" "))
    assert(doc1(1).getInt(2) == 26) // last chunk reaches the end: 50-24
    val doc2 = out.filter(_.getLong(0) == 2L)
    assert(doc2.length == 1 && doc2(0).getString(3) == "tiny doc")
  }

  test("gopherFilter attributes each rule and keeps only clean docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 30).map(i => s"word$i").mkString(" ")), // clean
      (2L, "too short"),                                 // fails len
      (3L, ("spam " * 30).trim),                         // fails dup + bigram
      (4L, (1 to 20).map(_ => "a").mkString(" "))        // fails tok_len + dup
    ).toDF("doc_id", "text")
    val out = graft.operators.Curation.gopherFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5))).toMap
    assert(out(1L) == ((true, true, true, true, true)))
    assert(out(2L)._1 == false && out(2L)._5 == false)
    assert(out(3L)._3 == false && out(3L)._4 == false && out(3L)._5 == false)
    assert(out(4L)._2 == false && out(4L)._3 == false && out(4L)._5 == false)
  }

  test("packSequences offsets are the per-stream running sum and bins tile the stream") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, ("tok " * i.toInt).trim))
      .toDF("doc_id", "text")
    val out = Curation.packSequences(docs, "doc_id", "text",
      budget = 16, numGroups = 4)
      .orderBy("grp", "doc_id").collect()
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      var expectedOff = 0L
      rows.foreach { r =>
        val (n, off, first, last) =
          (r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(off == expectedOff, s"offset gap at doc ${r.getLong(0)}")
        assert(first == off / 16 && last == (off + n - 1) / 16)
        expectedOff += n
      }
    }
    // every group used at the fixture size, and doc count preserved
    assert(out.map(_.getLong(1)).distinct.length == 4)
    assert(out.length == 40)
  }

  test("quantileKeep keeps the top fraction with boundary ties surviving") {
    import spark.implicits._
    val scored = Seq(
      (1L, 0.9), (2L, 0.8), (3L, 0.7), (4L, 0.7), (5L, 0.6),
      (6L, 0.5), (7L, 0.4), (8L, 0.3), (9L, 0.2), (10L, 0.1)
    ).toDF("id", "s")
    // ceil(0.3 * 10) = 3 → threshold is the 3rd-best score (0.7); the
    // tied 4th row ALSO survives — order-free semantics
    val kept = Curation.quantileKeep(scored, "s", 0.3)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L))
    // fraction 1 keeps everything
    assert(Curation.quantileKeep(scored, "s", 1.0).count() == 10)
  }

  test("quantileKeep: sketch-bracketed rank selection == top-m pick") {
    import spark.implicits._
    // 2000 rows with heavy ties and a smooth tail — both threshold
    // regimes must keep the IDENTICAL row set
    val scored = (1L to 2000L)
      .map(i => (i, if (i % 7 == 0) 0.5 else (i % 251).toDouble / 251))
      .toDF("id", "s")
    val viaTopM = Curation.quantileKeep(scored, "s", 0.2)
      .select("id").as[Long].collect().toSet
    spark.conf.set("spark.graft.quantile.topmMax", "1")
    try {
      val viaBracket = Curation.quantileKeep(scored, "s", 0.2)
        .select("id").as[Long].collect().toSet
      assert(viaBracket == viaTopM)
      // degenerate all-equal distribution: threshold is the value itself
      val flat = (1L to 100L).map(i => (i, 0.25)).toDF("id", "s")
      assert(Curation.quantileKeep(flat, "s", 0.1).count() == 100)
    } finally spark.conf.unset("spark.graft.quantile.topmMax")
  }

  test("quantileKeep executes the caller's upstream plan exactly once") {
    import spark.implicits._
    val passes = spark.sparkContext.longAccumulator("upstreamRows")
    // an upstream plan whose executions are observable: every run of the
    // map adds one per row, so k full executions read k*500
    val scored = (1L to 500L).toDF("id").as[Long]
      .map { i => passes.add(1); (i, (i % 97).toDouble) }
      .toDF("id", "s")
    val kept = Curation.quantileKeep(scored, "s", 0.2)
    assert(kept.count() > 0)
    assert(passes.value == 500L,
      s"upstream executed ${passes.value / 500.0} times, want exactly 1")
    // the sketch regime adds threshold passes — still exactly one
    passes.reset()
    spark.conf.set("spark.graft.quantile.topmMax", "1")
    try {
      assert(Curation.quantileKeep(scored, "s", 0.2).count() > 0)
      assert(passes.value == 500L,
        s"sketch regime executed upstream ${passes.value / 500.0} times")
    } finally spark.conf.unset("spark.graft.quantile.topmMax")
  }

  test("quantileKeep excludes null scores from the count and the output") {
    import spark.implicits._
    val scored = Seq(
      (1L, Some(0.9)), (2L, Some(0.8)), (3L, Some(0.5)), (4L, Some(0.1)),
      (5L, None), (6L, None), (7L, None), (8L, None)
    ).toDF("id", "s")
    // fraction is of the 4 SCOREABLE rows: m = 2 → threshold 0.8
    val kept = Curation.quantileKeep(scored, "s", 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
    // an all-null column yields an empty result, not an NPE
    val allNull = Seq((1L, Option.empty[Double]), (2L, None)).toDF("id", "s")
    assert(Curation.quantileKeep(allNull, "s", 0.5).count() == 0)
  }

  test("tokenBudgetSubset takes a maximal whole-doc prefix per writer stream") {
    import spark.implicits._
    // doc i carries exactly i tokens
    val docs = (1L to 40L).map(i => (i, ("tok " * i.toInt).trim))
      .toDF("doc_id", "text")
    val perShard = 80L / 4
    val out = Curation
      .tokenBudgetSubset(docs, "doc_id", "text", totalTokens = 80L, nShards = 4)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // within budget, and cum really is the running sum in pos order
    out.groupBy(_._1).foreach { case (_, rows) =>
      var run = 0L
      rows.sortBy(_._2).foreach { case (_, _, _, n, cum) =>
        run += n
        assert(cum == run && cum <= perShard)
      }
    }
    // maximality: the next doc in each stream's order would overflow
    val full = Curation.shardAssign(
        docs.select(col("doc_id"), col("text")), "doc_id", 4)
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(0)))
    val taken = out.map(_._3).toSet
    full.groupBy(_._1).foreach { case (shard, rows) =>
      val inOrder = rows.sortBy(_._2)
      val lastCum = out.filter(_._1 == shard).map(_._5).maxOption.getOrElse(0L)
      inOrder.find(r => !taken(r._3)).foreach { next =>
        // next doc id == its token count by construction
        assert(lastCum + next._3 > perShard,
          s"shard $shard stopped early: cum $lastCum, next doc ${next._3}")
      }
    }
  }

  test("domainTokenBudget honors per-domain shares, drops unweighted domains, and is prefix-closed") {
    import spark.implicits._
    // doc i carries i tokens; domains alternate a/a/b/c (c unweighted)
    val docs = (1L to 60L).map { i =>
      val dom = (i % 4) match { case 0 => "c"; case 1 | 2 => "a"; case _ => "b" }
      (i, ("tok " * i.toInt).trim, dom)
    }.toDF("doc_id", "text", "lang")
    val weights = Map("a" -> 0.6, "b" -> 0.4)
    val out = Curation.domainTokenBudget(
        docs, "doc_id", "text", "lang", weights,
        totalTokens = 200L, nShards = 2)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(0), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    // unweighted domain never appears
    assert(!out.exists(_._1 == "c"))
    // per-(domain, shard): cum is the running sum in pos order and stays
    // within the domain's share of the budget
    out.groupBy(t => (t._1, t._2)).foreach { case ((dom, _), rows) =>
      val perShard = math.floor(200.0 * weights(dom) / 2).toLong
      var run = 0L
      rows.sortBy(_._3).foreach { case (_, _, _, _, n, cum) =>
        run += n
        assert(cum == run && cum <= perShard)
      }
    }
    // prefix-closure: doubling the budget extends every stream without
    // disturbing what the smaller budget already shipped
    val bigger = Curation.domainTokenBudget(
        docs, "doc_id", "text", "lang", weights,
        totalTokens = 400L, nShards = 2)
      .select(col("doc_id"), col("domain"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    out.foreach { case (dom, shard, pos, id, _, _) =>
      assert(bigger((id, dom, shard, pos)),
        s"doc $id left the mixture when the budget grew")
    }
  }

  test("shardAssign is a deterministic permutation with dense per-shard positions") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    val a = Curation.shardAssign(df, "doc_id", 8).collect()
    val b = Curation.shardAssign(df, "doc_id", 8)
      .collect()
    // rerun-stable: identical (id → shard, pos) mapping
    assert(a.map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet ==
      b.map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet)
    // positions within each shard are dense 0..len-1
    a.groupBy(_.getLong(2)).foreach { case (_, rows) =>
      val ps = rows.map(_.getLong(3)).sorted
      assert(ps.sameElements(0L until ps.length))
    }
    // the shuffle actually permutes: hash order differs from id order
    val shard0 = a.filter(_.getLong(2) == a.head.getLong(2))
      .sortBy(_.getLong(3)).map(_.getLong(0))
    assert(!shard0.sameElements(shard0.sorted))
    // payload columns ride along untouched
    assert(a.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "payload", "shard", "pos"))
  }

  test("streaming budget admission fold is prefix-splittable") {
    // any batching of an ordered arrival sequence must admit the same
    // docs — the property that makes streamTokenBudget's micro-batch
    // boundary invisible (its state carries tokens SEEN, not admitted,
    // so the window closes permanently at the first crossing)
    import graft.operators.{BudgetDoc, BudgetState, Curation}
    val docs = (1L to 20L).map(i => BudgetDoc(i, 0L, n_tokens = i % 7 + 1))
    val perShard = 30L
    val (_, oneShot) = Curation.admitFold(BudgetState(0L), docs, perShard)
    for (split <- Seq(1, 5, 13, 19)) {
      val (s1, a1) = Curation.admitFold(BudgetState(0L), docs.take(split), perShard)
      val (_, a2) = Curation.admitFold(s1, docs.drop(split), perShard)
      assert(a1 ++ a2 == oneShot, s"split at $split diverged")
    }
    // the window closes at the first crossing: a small doc after a
    // crossing doc is NOT admitted (matches the batch prefix-sum filter)
    val cross = Seq(BudgetDoc(1, 0, 28), BudgetDoc(2, 0, 5), BudgetDoc(3, 0, 1))
    val (_, admitted) = Curation.admitFold(BudgetState(0L), cross, perShard)
    assert(admitted.map(_.doc_id) == Seq(1L))
  }
}
