package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** One arriving document in [[Curation.streamTokenBudget]]'s sequenced
  * ingest log: `seq` is the arrival sequence number (the ingest offset).
  */
case class BudgetDoc(seq: Long, shard: Long, n_tokens: Long)

/** Admission decision emitted per admitted doc. */
case class BudgetAdmit(doc_id: Long, shard: Long, n_tokens: Long, cum_tokens: Long)

/** [[BudgetDoc]] with its mixture domain — one arrival in
  * [[Curation.streamDomainTokenBudget]]'s (domain, shard)-keyed log.
  */
case class DomainBudgetDoc(seq: Long, domain: String, shard: Long, n_tokens: Long)

/** [[BudgetAdmit]] with the admitting writer stream's domain. */
case class DomainAdmit(
    doc_id: Long, domain: String, shard: Long, n_tokens: Long, cum_tokens: Long)

/** Per-shard running state: tokens SEEN so far (admitted or not — the
  * budget window closes at the first crossing, like the batch form's
  * prefix-sum filter).
  *
  * COMPATIBILITY: adding `lastSeq` (round 12's out-of-order self-check)
  * changed the flatMapGroupsWithState state-encoder schema, so a
  * [[Curation.streamTokenBudget]] query CANNOT resume from a checkpoint
  * written before that change — restart it with a fresh checkpoint
  * location (the budget re-derives from a replayed log; the state is
  * not the source of truth). Any future field added here breaks old
  * checkpoints the same way — note it here when it happens.
  */
case class BudgetState(seenTokens: Long, lastSeq: Long = -1L)

/** Corpus-curation operators a training-data pipeline runs between dedup
  * and tokenization: benchmark decontamination, PII detection/redaction,
  * token-window chunking (RAG prep), and sequence packing (pretraining
  * batch prep). All stay in codegen'd Catalyst expressions — no UDFs —
  * and every shape below is the one that survives 100 TB (noted per op).
  *
  * Reference analogue: none — these extend the reference's text pipeline
  * (src/reddit/headers/, SURVEY.md §2) with the curation stages the
  * builder brief names first-class.
  */
object Curation extends Serializable {

  /** Benchmark decontamination: flag training docs sharing ≥1 word n-gram
    * with any benchmark/eval document (the GPT-3-style n-gram overlap
    * rule). Returns (doc_id, n_contaminated_grams) for flagged docs only.
    *
    * Scale shape: the benchmark side is eval suites — MBs, not TBs — so
    * its distinct gram set is broadcast and the probe is a map-side hash
    * join on the exploded training grams: ONE scan of the corpus, no
    * shuffle of corpus data at all (only the per-doc overlap counts
    * aggregate, with map-side partial combine). The gram explode uses the
    * codegen'd single-pass shingler, not the interpreted nested-HOF form.
    */
  def decontaminate(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(wordShingles(col(textCol), n)).as("gram"))
      .distinct()
    train
      .select(col(idCol).as("doc_id"),
        explode(wordShingles(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      // shingles are distinct within a doc, so count(*) = distinct overlap
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_grams"))
  }

  /** PII patterns — kept to syntax that Java regex (Spark) and RE2
    * (DuckDB/the oracle) interpret identically: no backrefs, no lookaround,
    * ASCII word boundaries only.
    */
  val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  val phoneRe = """\b\d{3}-\d{3}-\d{4}\b"""

  /** PII detection + redaction: per-doc match counts for emails / IPv4
    * addresses / phone numbers, plus the text with each match replaced by
    * a typed placeholder. Pure codegen'd string expressions — one
    * projection, zero shuffles, trivially 100 TB-safe (embarrassingly
    * parallel over rows). Redaction order (email → ip → phone) is part of
    * the contract: placeholders contain no digits or '@', so later passes
    * never re-match earlier replacements.
    */
  def piiScan(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      regexp_count(col(textCol), lit(emailRe)).as("n_emails"),
      regexp_count(col(textCol), lit(ipv4Re)).as("n_ips"),
      regexp_count(col(textCol), lit(phoneRe)).as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), emailRe, "[EMAIL]"),
          ipv4Re, "[IP]"),
        phoneRe, "[PHONE]").as("redacted"))

  /** Text normalization — the canonical-form stage run before hashing /
    * shingling so trivial variants (case, punctuation, whitespace runs)
    * dedup together: lowercase, strip everything outside [a-z0-9 ],
    * collapse whitespace runs, trim. Pure codegen'd string expressions,
    * shuffle-free; patterns are Java/RE2-identical.
    */
  def normalizeText(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""), " +", " "))
    docs.select(col(idCol).as("doc_id"), norm.as("norm_text"),
      size(split(norm, " ")).as("n_tokens"))
  }

  /** Composite Gopher-style document filter: the rule set a curation
    * pipeline actually gates on, combining length bounds, mean-token-length
    * bounds, and the repetition fractions from
    * [[TextAnalysis.repetitionStats]]. Emits per-doc rule verdicts plus the
    * conjunction (`keep`), so downstream can both filter and audit WHY a
    * doc was dropped (rule attribution is what you tune at corpus scale).
    *
    * Scale shape: repetitionStats' two explode→aggregate passes (the
    * dominant cost, map-side combined) + one per-row projection joined on
    * doc_id. Thresholds compare round(…,6) doubles computed identically on
    * both engines, so the booleans are bit-deterministic.
    */
  def gopherFilter(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rep = TextAnalysis.repetitionStats(docs, idCol, textCol)
    val proj = docs.select(col(idCol).as("doc_id"),
      (length(regexp_replace(col(textCol), " ", "")).cast("double") /
        size(tokens(col(textCol)))).as("mean_tok_len"))
    rep.join(proj, Seq("doc_id"))
      .select(col("doc_id"),
        (col("n_words") >= 10 && col("n_words") <= 10000).as("len_ok"),
        (col("mean_tok_len") >= 2.0 && col("mean_tok_len") <= 12.0).as("tok_len_ok"),
        (col("dup_word_frac") < 0.6).as("dup_ok"),
        (col("top_bigram_frac") < 0.3).as("bigram_ok"))
      .withColumn("keep",
        col("len_ok") && col("tok_len_ok") && col("dup_ok") && col("bigram_ok"))
  }

  /** Token-window chunking for retrieval indexing: split each document
    * into windows of `chunkSize` tokens advancing by `stride` (overlap =
    * chunkSize − stride). A document of n tokens yields
    * 1 + max(0, ceil((n − chunkSize)/stride)) chunks — always ≥1, and the
    * last chunk always reaches the document's end.
    *
    * Scale shape: per-row generate-and-explode (sequence → transform →
    * posexplode), no shuffle, no state; output size is corpus size ×
    * (chunkSize/stride) by construction. The per-chunk slice runs inside
    * whole-stage codegen.
    */
  def chunkTokens(
      docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val toks = tokens(col(textCol))
    val n = size(toks)
    // integer ceil((n-C)/S) without float: (n - C + S - 1) div S
    val lastIdx = when(n <= chunkSize, lit(0))
      .otherwise(floor((n - chunkSize + stride - 1) / lit(stride)).cast("int"))
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(transform(sequence(lit(0), lastIdx), k =>
          struct(
            size(slice(toks, k * stride + 1, lit(chunkSize))).as("n_tokens"),
            array_join(slice(toks, k * stride + 1, lit(chunkSize)), " ").as("chunk")))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
        col("col.n_tokens").as("n_tokens"), col("col.chunk").as("chunk"))
  }

  /** Sequence packing for pretraining: concatenate the corpus into
    * `numGroups` independent writer streams (doc → stream by deterministic
    * content-independent hash of its id) and cut each stream into
    * fixed-`budget` token windows. Emits, per document, its stream, token
    * count, start offset in the stream, and the first/last context bins it
    * lands in — i.e. exactly where each doc's tokens sit in the packed
    * batches (docs straddle bin boundaries, as concat-and-chunk packing
    * does).
    *
    * Scale shape: ONE window (cumulative sum) partitioned by the stream
    * id. Parallelism = numGroups, so size numGroups to the cluster (it is
    * a parameter, not a constant); within a stream the sort key is the
    * doc id, which a 100 TB run makes a range-partitioned sort, not a
    * single-task sort, because each group is its own partition. No other
    * shuffle, no driver state.
    */
  def packSequences(
      docs: DataFrame, idCol: String, textCol: String,
      budget: Int, numGroups: Int): DataFrame = {
    require(budget >= 1 && numGroups >= 1,
      s"need positive budget/numGroups, got budget=$budget numGroups=$numGroups")
    val grp = pmod(
      TextAnalysis.fingerprint64(col(idCol).cast("string")), lit(numGroups.toLong))
    val base = docs.select(col(idCol).as("doc_id"), grp.as("grp"),
      size(tokens(col(textCol))).as("n_tokens"))
    val w = Window.partitionBy(col("grp")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("start_off",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)).cast("long"))
      .select(col("doc_id"), col("grp"), col("n_tokens"), col("start_off"),
        floor(col("start_off") / lit(budget)).cast("long").as("first_bin"),
        floor((col("start_off") + col("n_tokens") - 1) / lit(budget))
          .cast("long").as("last_bin"))
  }

  /** Global quality gate: keep the top `fraction` of rows by `scoreCol`
    * (classifier-score pruning, the "keep the best X%" curation step).
    * Deterministic and order-free: the threshold is the score of the
    * ⌈fraction·n⌉-th best row and every row scoring ≥ it survives, so
    * boundary ties all make the cut and a rerun (or a SQL oracle)
    * reproduces the exact row set.
    *
    * Scale shape — two regimes picking the SAME exact threshold:
    * m = ⌈fraction·n⌉ under `spark.graft.quantile.topmMax` (default 2²⁰)
    * goes through a global top-m (TakeOrderedAndProject — each task
    * keeps m rows, the driver merges m·tasks; no global sort). Larger m
    * switches to a sketch-bracketed exact pick: approx_percentile
    * brackets the boundary, two counts locate the exact rank inside the
    * bracket, and ONLY the bracket rows (sketch-error-bounded, not
    * O(m)) are sorted to read the threshold value — so the gate stays
    * value-exact at any corpus size. Both regimes end in the same
    * broadcast-scalar filter scan.
    *
    * Cost contract: the gate is multi-pass (count + threshold job(s) +
    * the final filter), so unless the caller already cached the input
    * it is materialized ONCE here (eager localCheckpoint) and every
    * pass — including the final filter — reads the materialized copy:
    * the caller's upstream plan executes exactly once regardless of
    * regime (CurationSpec pins this with an accumulator-counted
    * source). A standing pipeline that prefers lineage-safe storage
    * (localCheckpoint trades lineage for speed, the same trade
    * pipe_curate documents) can cache the input itself, or set
    * `spark.graft.quantile.selfMaterialize=false` when the input is a
    * bare scan cheaper to re-read than to store.
    *
    * Null scores can never pass the `>= threshold` filter, so they are
    * excluded from n as well: the gate keeps the top `fraction` of the
    * SCOREABLE rows (this also means `approx_percentile` in the sketch
    * regime can never observe an all-null column and return null).
    */
  def quantileKeep(scored: DataFrame, scoreCol: String,
      fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1,
      s"fraction must be in (0,1], got $fraction")
    val nonNull = scored.filter(col(scoreCol).isNotNull)
    val selfMat = scored.sparkSession.conf
      .get("spark.graft.quantile.selfMaterialize", "true").toBoolean
    val base =
      if (selfMat && scored.storageLevel ==
          org.apache.spark.storage.StorageLevel.NONE)
        nonNull.localCheckpoint(true)
      else nonNull
    val n = base.count()
    val m = math.max(1L, math.ceil(fraction * n).toLong)
    val topmMax = scored.sparkSession.conf
      .get("spark.graft.quantile.topmMax", (1 << 20).toString).toLong
    val thr = exactRankThreshold(base, scoreCol, m, topmMax, n)
    base.crossJoin(broadcast(thr))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }

  /** Exact m-th-largest value at any scale, as a 1-row (__thr) frame.
    * m within `topmMax` is one global top-m (per-task heap, k·tasks
    * driver merge). Larger m is distributed rank selection: bracket the
    * target rank with approx_percentile (±ε quantiles around it), prove
    * the bracket with two counts (sketch error is rank-bounded, so a
    * miss is detected and the bracket widens), then RECURSE on the
    * in-bracket rows — each round shrinks the candidate set by roughly
    * the sketch's accuracy factor, so a 10¹²-row corpus reaches the
    * top-m base case in a round or two of counts, never sorting or
    * merging more than the final bracket.
    *
    * Callers guarantee `scoreCol` is non-null on every row (quantileKeep
    * filters nulls before counting), so the approx_percentile result
    * below is never null.
    */
  private def exactRankThreshold(scored: DataFrame, scoreCol: String,
      m: Long, topmMax: Long, n: Long): DataFrame = {
    if (m <= math.min(topmMax, Int.MaxValue.toLong))
      return scored.select(col(scoreCol).as("__s"))
        .orderBy(col("__s").desc)
        .limit(m.toInt)
        .agg(min(col("__s")).as("__thr"))
    // n arrives from the caller (quantileKeep already counted; recursive
    // calls know the bracket size from the rank counts) — no recount
    val q = 1.0 - m.toDouble / n // target rank as an ascending quantile
    val acc = 10000 // approx_percentile rank error ≤ n/acc per bound
    var eps = 2.0 / acc
    while (true) {
      val lo = math.max(0.0, q - eps)
      val hi = math.min(1.0, q + eps)
      val Array(bLo, bHi) = scored
        .agg(expr(s"approx_percentile($scoreCol, array($lo, $hi), $acc)"))
        .head().getSeq[Any](0).map(_.toString.toDouble).toArray
      val above = scored.filter(col(scoreCol) > lit(bHi)).count()
      val aboveLo = scored.filter(col(scoreCol) > lit(bLo)).count()
      if (above < m && aboveLo >= m) {
        // the m-th largest lies in (bLo, bHi]: it is the (m - above)-th
        // largest of the bracket rows — recurse on that small set
        val inBracket =
          scored.filter(col(scoreCol) > lit(bLo) && col(scoreCol) <= lit(bHi))
        // |inBracket| = count(> bLo) - count(> bHi), both already in hand
        return exactRankThreshold(inBracket, scoreCol, m - above, topmMax,
          aboveLo - above)
      }
      if (lo == 0.0 && hi == 1.0) {
        // full range and still no bracket: count(> min) < m, so the
        // m-th largest IS the minimum value
        return scored.agg(min(col(scoreCol)).as("__thr"))
      }
      eps *= 4 // sketch missed the rank: widen and retry
    }
    sys.error("unreachable")
  }

  /** Deterministic global shuffle + shard assignment — the "shuffle the
    * corpus before training" step in rerun-stable form: shard =
    * md5(id) mod `nShards`, position = rank of (md5(id), id) within the
    * shard. Every rerun or resume sees the identical order and a SQL
    * oracle reproduces it row-for-row — the reason this keys on md5, not
    * rand() or a zipWithIndex whose values depend on partition layout.
    * md5 rather than the Rabin-Karp kernel for the [[Sampling]] reason:
    * short numeric ids never wrap the rolling modulus, so that hash
    * would be order-PRESERVING — no shuffle at all.
    *
    * Scale shape: one hash projection plus one windowed rank PER SHARD —
    * parallelism = nShards (a parameter; a 100 TB corpus ships as
    * thousands of shards anyway), no global sort, no driver state; the
    * per-shard (md5, id) sort spills like any window sort.
    */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"need a positive shard count, got $nShards")
    val h = col(idCol).cast("string").cast("binary")
    // top 15 md5 hex digits → uniform non-negative 60-bit value
    val hv = conv(substring(md5(h), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(md5(h), col(idCol))
    df.withColumn("shard", (hv % nShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
  }

  /** Token-budget corpus subset — "train on the first `totalTokens` of
    * the shuffled mix": documents are taken in [[shardAssign]]'s
    * deterministic shuffle order until each of the `nShards` writer
    * streams exhausts its equal share (⌊total/shards⌋) of the budget. A
    * doc that would cross its stream's share is dropped whole (documents
    * are the atomic unit here; [[packSequences]] is the operator that
    * splits across window boundaries). Deterministic, rerun-stable, and
    * order-free output: (idCol, shard, pos, n_tokens, cum_tokens).
    *
    * Scale shape: the shard/pos window of [[shardAssign]] plus ONE
    * running-sum window over the same per-shard partitioning — no
    * global cumulative sum (the classic scale trap for "first N tokens"
    * is a single global prefix scan; the per-stream share is how a
    * sharded writer meets a corpus-level budget without one).
    */
  def tokenBudgetSubset(docs: DataFrame, idCol: String, textCol: String,
      totalTokens: Long, nShards: Int): DataFrame = {
    require(totalTokens >= 1, s"need a positive budget, got $totalTokens")
    val perShard = totalTokens / nShards
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    shardAssign(docs.select(col(idCol), col(textCol)), idCol, nShards)
      .withColumn("n_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= perShard)
      .select(col(idCol), col("shard"), col("pos"), col("n_tokens"),
        col("cum_tokens"))
  }

  /** Domain-weighted token budget — data-MIXTURE execution, the step
    * between "decide the mixture" (DoReMi-style weights, a modeling
    * choice made elsewhere) and "ship the training set": each domain d
    * in `weights` gets its own [[tokenBudgetSubset]]-style budget of
    * ⌊totalTokens·w_d⌋ tokens, taken in the same deterministic md5
    * shuffle order over `nShards` writer streams per domain. Domains
    * absent from `weights` are excluded entirely (weight 0 — the way a
    * mixture drops a source). Docs with null text are excluded (they
    * carry no tokens and would occupy shuffle positions).
    *
    * Output: (idCol, domain, shard, pos, n_tokens, cum_tokens) — pos
    * and cum_tokens are per (domain, shard), so the result is a set of
    * |weights|·nShards independent writer streams, each prefix-closed:
    * rerunning with a larger budget extends every stream without
    * reshuffling what an earlier run already shipped.
    *
    * Scale shape: one broadcast join against the |weights|-row table,
    * one hash projection, and two windows partitioned by
    * (domain, shard) — parallelism |weights|·nShards, no global sort,
    * no cross-domain coordination; the per-row threshold
    * ⌊total·w/nShards⌋ rides the joined weight column, so one plan
    * serves every domain.
    */
  def domainTokenBudget(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String, weights: Map[String, Double],
      totalTokens: Long, nShards: Int): DataFrame = {
    require(totalTokens >= 1, s"need a positive budget, got $totalTokens")
    require(nShards >= 1, s"need a positive shard count, got $nShards")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "need a non-empty mixture of positive weights")
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF(domainCol, "w")
    val h = col(idCol).cast("string").cast("binary")
    val hv = conv(substring(md5(h), 1, 15), 16, 10).cast("long")
    val wPos = Window.partitionBy(col(domainCol), col("shard"))
      .orderBy(md5(h), col(idCol))
    val wCum = Window.partitionBy(col(domainCol), col("shard"))
      .orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), col(textCol), col(domainCol))
      .filter(col(textCol).isNotNull)
      .join(broadcast(wdf), Seq(domainCol))
      .withColumn("shard", (hv % nShards).cast("long"))
      .withColumn("pos", row_number().over(wPos).cast("long") - 1)
      .withColumn("n_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wCum))
      .filter(col("cum_tokens") <=
        floor(lit(totalTokens.toDouble) * col("w") / nShards).cast("long"))
      .select(col(idCol), col(domainCol).as("domain"), col("shard"),
        col("pos"), col("n_tokens"), col("cum_tokens"))
  }

  /** The per-shard admission fold shared by the streaming operator and
    * its spec: process `docs` (MUST be sequence-ordered) on top of the
    * carried state, admitting each doc whose shard-cumulative token count
    * stays within `perShard`. The cumulative counts EVERY arrived doc
    * (admitted or not), so the budget window closes permanently at the
    * first crossing — the same semantics as [[tokenBudgetSubset]]'s
    * prefix-sum filter, which makes the fold prefix-splittable: folding
    * any batching of an ordered arrival sequence produces the same
    * admissions (pinned by CurationSpec).
    */
  private[graft] def admitFold(
      state: BudgetState, docs: Seq[BudgetDoc],
      perShard: Long): (BudgetState, Seq[BudgetAdmit]) = {
    var seen = state.seenTokens
    var last = state.lastSeq
    val out = Seq.newBuilder[BudgetAdmit]
    docs.foreach { d =>
      // the batch-oracle equivalence contract is per-shard sequence order
      // ACROSS batches (the scaladoc's ingest-log contract); a source
      // that replays or reorders offsets across triggers would otherwise
      // silently admit a different set than the prefix-sum oracle — make
      // the contract self-checking and fail loudly instead
      if (d.seq <= last) throw new IllegalStateException(
        s"streamTokenBudget: out-of-order arrival seq=${d.seq} on shard " +
          s"${d.shard} after seq=$last — per-shard cross-batch sequence " +
          "order is the oracle-equivalence contract")
      last = d.seq
      seen += d.n_tokens
      if (seen <= perShard)
        out += BudgetAdmit(d.seq, d.shard, d.n_tokens, seen)
    }
    (BudgetState(seen, last), out.result())
  }

  /** Streaming token-budget admission — the budget gate applied at
    * INGEST instead of over the stored corpus: documents arrive as a
    * sequenced log (`idCol` is the ingest offset), each routes to its
    * md5 writer shard ([[shardAssign]]'s hash), and a standing per-shard
    * token counter admits docs until the shard's share (⌊total/shards⌋)
    * is exhausted. Emits only admitted docs, in Append mode.
    *
    * Where [[tokenBudgetSubset]] takes the budget over the SHUFFLED
    * stored mix (md5 position order), this takes it over the ingest
    * sequence — the semantics of "stop accepting once the budget is
    * full" that a live collection pipeline needs. Equivalence to the
    * batch oracle (per-shard prefix sum in sequence order) holds when
    * arrivals are delivered in sequence order per shard — the Kafka
    * offset / ingest-log contract; each micro-batch is additionally
    * sorted per shard so intra-batch parallel file reads cannot reorder
    * a batch internally.
    *
    * Scale shape: state is ONE counter per shard (nShards longs total,
    * nothing grows with the stream); each micro-batch does one narrow
    * projection + one per-shard sorted fold. No timeouts — the budget
    * has no expiry.
    */
  def streamTokenBudget(
      stream: DataFrame, idCol: String, textCol: String,
      totalTokens: Long, nShards: Int): org.apache.spark.sql.Dataset[BudgetAdmit] = {
    require(totalTokens >= 1, s"need a positive budget, got $totalTokens")
    require(nShards >= 1, s"need a positive shard count, got $nShards")
    val perShard = totalTokens / nShards
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val h = col(idCol).cast("string").cast("binary")
    val hv = conv(substring(md5(h), 1, 15), 16, 10).cast("long")
    val docs = stream.select(
      col(idCol).cast("long").as("seq"),
      (hv % nShards).cast("long").as("shard"),
      size(tokens(col(textCol))).cast("long").as("n_tokens")).as[BudgetDoc]
    def update(shard: Long, rows: Iterator[BudgetDoc],
        state: GroupState[BudgetState]): Iterator[BudgetAdmit] = {
      val sorted = rows.toSeq.sortBy(_.seq)
      val (next, admitted) = admitFold(
        state.getOption.getOrElse(BudgetState(0L)), sorted, perShard)
      state.update(next)
      admitted.iterator
    }
    docs.groupByKey(_.shard)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming domain-weighted mixture admission — the ingest-time form
    * of [[domainTokenBudget]], completing the streaming symmetry of the
    * mixture family (VERDICT r13 next #2): arriving docs route to their
    * (domain, shard) writer stream — the md5 shard of
    * [[streamTokenBudget]] within each mixture domain — and a standing
    * per-stream token counter admits docs in ingest-sequence order until
    * the stream's share ⌊total·w_d⌋/nShards of the corpus budget closes.
    * Docs from domains absent from `weights` are excluded before the
    * stateful stage (weight 0 — the way a mixture drops a source), as
    * are null texts, exactly like the batch form.
    *
    * The per-stream share is computed as (total·w_d)/nShards in IEEE
    * doubles with the same op order as the batch operator's
    * `floor(total·w/nShards)` column and the oracle's
    * `FLOOR(30000.0·w/8)`, so all three engines admit the identical set.
    *
    * Where [[domainTokenBudget]] budgets the stored shuffled mix (md5
    * position order per domain), this budgets each domain's live arrival
    * sequence — "stop accepting source d once its share is full".
    * Equivalence to the batch oracle (per-(domain, shard) prefix sum in
    * sequence order) holds under the per-shard ordered-delivery contract
    * [[streamTokenBudget]] documents and [[Curation.admitFold]]
    * self-checks; each micro-batch additionally sorts within its
    * (domain, shard) group.
    *
    * Scale shape: state is ONE counter per (domain, shard) —
    * O(|domains|·nShards) longs, nothing grows with the stream; each
    * micro-batch is one narrow projection + one per-group sorted fold.
    * The weights map rides task-serialized (a mixture has tens of
    * domains, not millions — the same bound [[domainTokenBudget]]'s
    * broadcast join assumes).
    */
  def streamDomainTokenBudget(
      stream: DataFrame, idCol: String, textCol: String, domainCol: String,
      weights: Map[String, Double], totalTokens: Long,
      nShards: Int): org.apache.spark.sql.Dataset[DomainAdmit] = {
    require(totalTokens >= 1, s"need a positive budget, got $totalTokens")
    require(nShards >= 1, s"need a positive shard count, got $nShards")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "need a non-empty mixture of positive weights")
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val h = col(idCol).cast("string").cast("binary")
    val hv = conv(substring(md5(h), 1, 15), 16, 10).cast("long")
    val docs = stream
      .filter(col(textCol).isNotNull &&
        col(domainCol).isin(weights.keys.toSeq: _*))
      .select(
        col(idCol).cast("long").as("seq"),
        col(domainCol).cast("string").as("domain"),
        (hv % nShards).cast("long").as("shard"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .as[DomainBudgetDoc]
    def update(key: (String, Long), rows: Iterator[DomainBudgetDoc],
        state: GroupState[BudgetState]): Iterator[DomainAdmit] = {
      val perStream =
        math.floor(totalTokens.toDouble * weights(key._1) / nShards).toLong
      val sorted = rows.toSeq.sortBy(_.seq)
        .map(d => BudgetDoc(d.seq, d.shard, d.n_tokens))
      val (next, admitted) = admitFold(
        state.getOption.getOrElse(BudgetState(0L)), sorted, perStream)
      state.update(next)
      admitted.iterator.map(a =>
        DomainAdmit(a.doc_id, key._1, a.shard, a.n_tokens, a.cum_tokens))
    }
    docs.groupByKey(d => (d.domain, d.shard))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
