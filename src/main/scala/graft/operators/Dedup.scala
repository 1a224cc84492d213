package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for large-scale corpus curation. The reference
  * engine has no dedup operator (distinct is a group-by with the value
  * ignored — reference: src/sharedLibraries/headers/DistinctProjection.h);
  * these extend the capability surface for training-data pipelines.
  *
  * Four granularities, each with find AND act forms:
  *  - whole-doc exact ([[exact]]) and near-dup ([[minhashPairs]] /
  *    [[ngramJaccardPairs]] / [[simhashPairs]] → [[dupClusters]] → keep
  *    list), plus the ingest-time forms ([[crossPairs]],
  *    [[persistLshIndex]], [[streamNearDupPairs]], and the exact-match
  *    standing index [[persistExactIndex]] / [[exactAgainstStoredIndex]]
  *    / [[streamExactAgainstStoredIndex]]);
  *  - passage-level exact ([[duplicateSpans]] → [[stripDuplicateSpans]],
  *    ingest-time [[persistGramIndex]] / [[spansAgainstStoredIndex]] /
  *    [[streamSpansAgainstStoredIndex]]);
  *  - embedding near-dup ([[cosinePairs]] brute baseline,
  *    [[cosineLshPairs]] hyperplane LSH);
  *  - semantic / paraphrase-level ([[semanticPairs]], kmeans-bucketed).
  *
  * Scale design: every op is a shuffle-on-key plan. Exact dedup shuffles on
  * the content hash; MinHash/SimHash shuffle on band keys (candidate pairs
  * only — never O(n²)); span dedup shuffles 16-byte binary window fingerprints;
  * the brute-force pair verifiers run only on the pruned candidate set.
  */
object Dedup {

  /** Shared LSH materialization epilogue. Default: localCheckpoint the
    * (small) result eagerly and release the intermediate caches —
    * otherwise every LSH query leaks cached partitions for the session
    * lifetime (localCheckpoint blocks are GC-cleaned by the
    * ContextCleaner, unlike CacheManager entries).
    *
    * CAVEATS (localCheckpoint): (1) eager — the whole pipeline runs at
    * operator-construction time, not at the caller's action; (2) lineage
    * is truncated into executor-local blocks, so on a real cluster an
    * executor loss (or dynamic-allocation decommission) makes the
    * checkpointed partitions unrecoverable and downstream actions fail.
    * On a cluster with executor churn set
    * `spark.graft.dedup.materialize=none`: the plan is returned lazy with
    * its lineage intact and the caches stay persisted — the CALLER must
    * unpersist (or write the result to reliable storage) when done.
    */
  private def materialize(result: DataFrame, caches: DataFrame*): DataFrame = {
    val mode = result.sparkSession.conf
      .get("spark.graft.dedup.materialize", "localCheckpoint")
    if (mode == "none") result
    else {
      val out = result.localCheckpoint(true)
      caches.foreach(_.unpersist())
      out
    }
  }

  /** Exact dedup by content fingerprint: one row per distinct key with the
    * kept (min) id and the duplicate count. Groups by the 16-byte md5 of
    * the key, NOT the key itself: map-side partial aggregation collapses
    * duplicates before the exchange, but on a mostly-unique corpus every
    * DISTINCT document still travels — the grouping key IS the shuffle
    * payload, and at 100 TB that is the operator's entire byte cost
    * (guide §2.3: shuffle keys and metadata instead of payloads). The
    * fingerprint replaces kilobytes of text with a fixed 16 bytes.
    *
    * Collision stance: md5 is 128 bits, so the birthday bound at n keys
    * is ~n²/2¹²⁹ — ≈1.5e-15 at a TRILLION documents, orders below the
    * undetected-error rates of the hardware the shuffle crosses. A
    * 64-bit hash would NOT be safe (~50% collision odds at ~5e9 keys);
    * this is the same 128-bit choice [[persistExactIndex]] has always
    * persisted, now applied to the one-shot operator. A null key
    * fingerprints to null and still groups as the single null-key group,
    * exactly as the raw key did.
    */
  def exact(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(unhex(md5(key)).as("content_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"))

  /** MinHash + LSH near-dup pairs over word n-gram shingles.
    *
    * shingle → k-wide minhash signature → b bands of r slots → explode bands
    * → self-join on (band, bandkey) → distinct candidate pairs → verify with
    * exact set-jaccard ≥ threshold.
    *
    * Shingles (not raw word sets) are deliberate: on a corpus with a small
    * vocabulary, word *sets* collide massively and "near-dup at j≥0.8"
    * degenerates to a quadratic result — the standard corpus-dedup recipe
    * shingles first so true near-dups stay sparse.
    *
    * Band geometry: r=4 rows × 32 bands. Collision probability per band is
    * j^r, so a background-similarity pair (j≈0.1, common with small
    * vocabularies) collides with p≈1e-4 while a true near-dup at j≥0.9
    * still collides with certainty (miss prob (1-0.9⁴)³² ≈ 1e-16 — the
    * result matches an exact oracle deterministically). r=2 would make the
    * candidate set quadratic on such corpora.
    * The band join shuffles candidates only — never materializing O(n²).
    */
  def minhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, k: Int = 128, bands: Int = 32,
      shingleN: Int = 2): DataFrame =
    lshVerifiedPairs(docs, idCol,
      wordShingles(col(textCol), shingleN), threshold, k, bands)

  /** Shared LSH candidate/verify plan. The banding side carries only
    * (id, band, bandkey) scalars — shingle sets would otherwise be
    * duplicated `bands`× through the explode and shuffle; they are joined
    * back only for the (small) candidate set's exact-jaccard verification.
    *
    * Super-bucket cap: a band bucket whose minhash slice is dominated by
    * corpus-common shingles can contain a large fraction of all documents,
    * making the self-join output quadratic in that bucket while carrying no
    * discriminative signal. Buckets above `maxBucket` are dropped (standard
    * large-scale LSH practice); a true near-dup pair at j≥threshold
    * collides in ~bands·j^r other buckets, so recall is preserved — the
    * sf0.01 oracle equality check validates this.
    */
  private def lshVerifiedPairs(
      docs: DataFrame, idCol: String, shingleExpr: Column,
      threshold: Double, k: Int, bands: Int, maxBucket: Int = 200): DataFrame = {
    val (withSets, banded, candidates) =
      lshCandidateFrames(docs, idCol, shingleExpr, k, bands, maxBucket)
    val verified = candidates
      .join(withSets.select(col("id").as("id_a"), col("ws").as("ws_a")), Seq("id_a"))
      .join(withSets.select(col("id").as("id_b"), col("ws").as("ws_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("ws_a"), col("ws_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    materialize(verified, withSets, banded)
  }

  /** The candidate stage of [[lshVerifiedPairs]], exposed for the scale
    * soak (graft.Soak): returns (persisted shingle sets, persisted band
    * keys, candidate pairs after the super-bucket cap and ≥2-band filter)
    * so candidate-set growth can be measured against corpus size without
    * paying for verification. Callers must unpersist the first two.
    */
  /** The shingle-set and band-key frames shared by the self-join LSH, the
    * cross-corpus LSH, and the streaming ingest dedup: (persisted
    * (id, ws) sets, persisted (id, band, bkey) scalars). Callers own the
    * unpersist.
    */
  private[graft] def bandFrames(
      docs: DataFrame, idCol: String, shingleExpr: Column,
      k: Int, bands: Int): (DataFrame, DataFrame) = {
    val r = k / bands
    // persisted: referenced by both verify-join sides AND as the explode
    // source below, so the interpreted shingle transform evaluates exactly
    // once per document. The repartition matters: a small-file corpus scans
    // as ONE partition, serializing the (interpreted, non-codegen)
    // ArrayTransform on a single core — measured 13s → ~2s at sf0.1.
    val withSets = Parallelism.ensureWidth(docs)
      .select(col(idCol).as("id"), shingleExpr.as("ws")).persist()
    // Signature computed relationally: explode the cached shingle sets,
    // then one TypedImperativeAggregate producing the k-wide signature.
    // The nested-transform formulation (minhashSignature/lshBands) is
    // interpreted-eval and re-evaluates its captured subtree per
    // seed/band — a ~k× per-row blowup measured on the fixtures.
    val shingled = withSets.select(col("id"), explode(col("ws")).as("sh"))
    val sigDf = shingled.groupBy(col("id"))
      .agg(graft.functions.MinHashAgg.minhashSig(col("sh"), k).as("sig"))
    // band keys from the post-aggregate `sig` attribute (an aggregate is a
    // pipeline barrier, so slices are cheap attribute reads)
    val bandArr = array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b), slice(col("sig"), b * r + 1, r)).as("bkey"))).toIndexedSeq: _*)
    val banded = sigDf
      .select(col("id"), explode(bandArr).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      // referenced by the hot-bucket scan and both self-join sides — persist
      // the (id, band, bkey) scalars or the whole signature pipeline
      // re-executes once per reference
      .persist()
    (withSets, banded)
  }

  private[graft] def lshCandidateFrames(
      docs: DataFrame, idCol: String, shingleExpr: Column,
      k: Int, bands: Int, maxBucket: Int = 200): (DataFrame, DataFrame, DataFrame) = {
    val (withSets, banded) = bandFrames(docs, idCol, shingleExpr, k, bands)
    val hot = banded.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
      .select(col("band"), col("bkey"))
    val pruned = banded.join(broadcast(hot), Seq("band", "bkey"), "left_anti")
    val a = pruned.select(col("band"), col("bkey"), col("id").as("id_a"))
    val b = pruned.select(col("band"), col("bkey"), col("id").as("id_b"))
    // require ≥2 matching bands: a background pair collides in ~1 band
    // while a true pair at j≥threshold collides in ~bands·j^r ≫ 2 — cuts
    // the verify set ~10× (miss probability stays ≤1e-5; the sf0.01 oracle
    // equality validates)
    val candidates = a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") >= 2)
      .select(col("id_a"), col("id_b"))
    (withSets, banded, candidates)
  }

  /** N-gram (word shingle) jaccard near-dup pairs — order-sensitive variant.
    * Same LSH pruning as [[minhashPairs]], verified with exact shingle
    * jaccard.
    */
  /** r=2 geometry (not r=4): the 0.5 threshold needs per-band collision
    * p=j² ≈ 0.25 at the margin; with b=48 the miss probability at j=0.5 is
    * (1-0.25)⁴⁸ ≈ 1e-6. The 3-gram shingle space is sparse enough that
    * background pairs stay rare even at r=2.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 3,
      threshold: Double = 0.5, k: Int = 96, bands: Int = 48): DataFrame =
    lshVerifiedPairs(docs, idCol, wordShingles(col(textCol), n),
      threshold, k, bands)

  /** A reusable LSH index of an existing corpus for INGEST-TIME dedup:
    * (persisted shingle sets, persisted band keys with hot buckets already
    * removed). The hot-bucket cap is computed on the corpus ALONE — never
    * on the arriving data — so matching against the index is invariant to
    * how the new data is batched (the streaming path depends on this).
    * Callers own the unpersist of both frames — and both RETURNED frames
    * are the persisted frames themselves: the pruned band frame is
    * persisted and eagerly materialized here, then the intermediate
    * full band frame is released before returning. (Returning a plan
    * DERIVED from a persisted frame would make the caller's unpersist a
    * no-op — Dataset.unpersist only drops same-result plans — leaking the
    * band cache for the session lifetime.)
    */
  def corpusLshIndex(
      corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 128, bands: Int = 32, shingleN: Int = 2,
      maxBucket: Int = 200): (DataFrame, DataFrame) = {
    val (cSets, cBanded) =
      bandFrames(corpus, idCol, wordShingles(col(textCol), shingleN), k, bands)
    val hot = cBanded.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
      .select(col("band"), col("bkey"))
    val pruned = cBanded.join(broadcast(hot), Seq("band", "bkey"), "left_anti")
      .persist()
    pruned.count() // materialize while the base band cache is still hot
    cBanded.unpersist(blocking = false)
    (cSets, pruned)
  }

  /** Persist a [[corpusLshIndex]] into the set catalog: the shingle sets
    * BUCKETED on id and the (hot-pruned) band keys BUCKETED on the
    * composite (band, bkey) — the Lachesis placement thesis applied to
    * the standing dedup index. Build once; every later ingest batch
    * joins against the stored sets, and because each join's key set
    * equals its set's bucket columns exactly ((band, bkey) for the
    * candidate join, id for the verify join — Spark's co-partition check
    * demands the full match), the CORPUS side — the side that dwarfs
    * every arriving batch at 100 TB — re-shuffles in neither.
    * Session-survivable, unlike the in-memory index's executor-pinned
    * caches.
    */
  /** Bucket-count choice: an explicit `numBuckets` wins; otherwise an
    * `advisor` applies the Lachesis sizing rule
    * ([[graft.advisor.PlacementAdvisor.recommendBuckets]] — power-of-two
    * count keeping each bucket near `targetRowsPerBucket` rows, sized
    * from the band set, the index's larger side) so standing indexes
    * inherit the placement layer's decision automatically; with neither,
    * the session's shuffle-partition count (the pre-round-8 behavior).
    */
  def persistLshIndex(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 128, bands: Int = 32, shingleN: Int = 2,
      maxBucket: Int = 200, numBuckets: Int = 0,
      advisor: Option[graft.advisor.PlacementAdvisor] = None,
      targetRowsPerBucket: Long = 1L << 22): Unit = {
    val spark = corpus.sparkSession
    val (cSets, cBanded) =
      corpusLshIndex(corpus, idCol, textCol, k, bands, shingleN, maxBucket)
    // no-advisor default sizes from the data too (bucketCountFor — the
    // advisor's rule without the co-partition-group history): the old
    // session-shuffle-partition fallback stamped a local-core-count
    // constant into the stored layout. cBanded is persisted and already
    // materialized, so the count is a cached-frame pass either way.
    val n = if (numBuckets > 0) numBuckets
      else advisor
        .map(_.recommendBuckets(s"$db.${name}_bands", cBanded.count(),
          targetRowsPerBucket))
        .getOrElse(graft.advisor.PlacementAdvisor
          .bucketCountFor(cBanded.count(), targetRowsPerBucket))
    catalog.createBucketedSet(db, s"${name}_sets", cSets, "id", n)
    catalog.createBucketedSet(db, s"${name}_bands", cBanded,
      Seq("band", "bkey"), n)
    cSets.unpersist(blocking = false)
    cBanded.unpersist(blocking = false)
  }

  /** [[crossPairsAgainstIndex]] over a [[persistLshIndex]]-stored index:
    * scans the bucketed sets through the catalog, so the corpus side
    * arrives pre-partitioned on the join keys.
    */
  def crossPairsAgainstStoredIndex(
      newDocs: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, idCol: String, textCol: String,
      threshold: Double = 0.8, k: Int = 128, bands: Int = 32,
      shingleN: Int = 2): DataFrame =
    crossPairsAgainstIndex(newDocs,
      catalog.scanBucketedSet(db, s"${name}_sets"),
      catalog.scanBucketedSet(db, s"${name}_bands"),
      idCol, textCol, threshold, k, bands, shingleN)

  /** Near-dup pairs of `newDocs` AGAINST a [[corpusLshIndex]] — the
    * incremental form of [[minhashPairs]] a pipeline runs on every ingest
    * batch instead of re-deduping the whole corpus. Same geometry and
    * ≥2-band candidate filter as the self-join path; the corpus side's
    * shuffles are amortized across calls through the index's persisted
    * frames. Per-doc results depend only on that doc and the static index,
    * so unioning per-batch outputs equals the one-shot batch result.
    */
  def crossPairsAgainstIndex(
      newDocs: DataFrame, corpusSets: DataFrame, corpusBanded: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.8,
      k: Int = 128, bands: Int = 32, shingleN: Int = 2): DataFrame = {
    val (nSets, nBanded) =
      bandFrames(newDocs, idCol, wordShingles(col(textCol), shingleN), k, bands)
    val candidates = nBanded
      .select(col("band"), col("bkey"), col("id").as("new_id"))
      .join(corpusBanded.select(col("band"), col("bkey"), col("id").as("corpus_id")),
        Seq("band", "bkey"))
      .groupBy(col("new_id"), col("corpus_id"))
      .agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") >= 2)
      .select(col("new_id"), col("corpus_id"))
    val verified = candidates
      .join(nSets.select(col("id").as("new_id"), col("ws").as("ws_n")), Seq("new_id"))
      .join(corpusSets.select(col("id").as("corpus_id"), col("ws").as("ws_c")),
        Seq("corpus_id"))
      .select(col("new_id"), col("corpus_id"),
        jaccard(col("ws_n"), col("ws_c")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    materialize(verified, nSets, nBanded)
  }

  /** One-shot batch form: index the corpus, match the new docs, release
    * the index.
    */
  def crossPairs(
      newDocs: DataFrame, corpus: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, k: Int = 128, bands: Int = 32,
      shingleN: Int = 2, maxBucket: Int = 200): DataFrame = {
    val (cSets, cBanded) =
      corpusLshIndex(corpus, idCol, textCol, k, bands, shingleN, maxBucket)
    try crossPairsAgainstIndex(newDocs, cSets, cBanded, idCol, textCol,
      threshold, k, bands, shingleN)
    finally { cSets.unpersist(blocking = false); cBanded.unpersist(blocking = false) }
  }

  /** Streaming ingest dedup: match an arriving document stream against the
    * static corpus index, one [[crossPairsAgainstIndex]] per micro-batch
    * (foreachBatch — the batch kernels run unchanged on each batch, the
    * same pattern as [[graft.streaming.EventStreams.upsertSnapshot]]).
    * Output is batching-invariant by construction: the hot-bucket cap
    * lives in the index, and each arriving doc's pairs depend only on that
    * doc plus the index — so any batching unions to the one-shot batch
    * result.
    *
    * Two accumulation modes for the pair log. With `sink` set to
    * `(catalog, db, set)`, each batch's pairs APPEND to that stored set
    * and the returned frame scans it — the production form: the log
    * lives in reliable storage, nothing driver-anchored grows with the
    * stream, and a restarted pipeline keeps appending to the same set.
    * Without a sink (the oracle-query form) the log accumulates as
    * per-batch driver-held checkpoints and is returned when the stream
    * drains — fine at fixture scale, but the checkpoint chain is pinned
    * to this session's executors.
    */
  def streamNearDupPairs(
      stream: DataFrame, corpus: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, k: Int = 128, bands: Int = 32,
      shingleN: Int = 2, maxBucket: Int = 200,
      sink: Option[(graft.storage.SetCatalog, String, String)] = None): DataFrame = {
    val (cSets, cBanded) =
      corpusLshIndex(corpus, idCol, textCol, k, bands, shingleN, maxBucket)
    val out = streamProbe(stream,
      batch => crossPairsAgainstIndex(batch, cSets, cBanded,
        idCol, textCol, threshold, k, bands, shingleN),
      sink)
    cSets.unpersist(blocking = false)
    cBanded.unpersist(blocking = false)
    out
  }

  /** SELF-GROWING streaming near-dup — the MinHash analogue of
    * [[streamIngestExactDedup]]: arrivals pair against everything that
    * arrived BEFORE them, not against a frozen corpus. Each micro-batch
    * (1) self-joins its own band keys for intra-batch candidate pairs
    * (id_a < id_b), (2) joins them against the STANDING band set for
    * cross-batch candidates, (3) verifies both with exact shingle
    * jaccard, and (4) appends the batch's shingle sets + band keys to
    * the standing sets so every later batch pairs against this one.
    * Under ANY batching of the arrivals — ordered or interleaved ids
    * alike — the accumulated pair log is EXACTLY the one-shot self-join
    * pair set ([[minhashPairs]]' canonical output, which the
    * exact-jaccard oracle pins): each true pair is found once, by
    * whichever batch arrives later (candidates are canonicalized to
    * id_a < id_b, not orientation-filtered — [[ingestNearDupCandidates]]).
    * The verified frame is localCheckpointed BEFORE the appends
    * ([[streamIngestExactDedup]]'s reason: a lazy recompute after the
    * append would find each arrival's own bands in the standing set).
    *
    * No PER-BATCH hot-bucket cap, unlike the static-index forms: a
    * growing index cannot compute a batching-invariant global bucket
    * census mid-stream. The ≥2-band candidate rule bounds background
    * collisions between recaps, and the maintenance valve IS code:
    * [[recapIngestNearDupIndex]] periodically compacts the growing sets
    * into a fresh generation with the static forms' hot-bucket census
    * re-applied (crash-committed via
    * [[graft.storage.SetCatalog.swapSetGroup]], the ANN rebuild
    * machinery), after which the sets keep ingesting —
    * [[ingestBandCensus]] is the dial that says when.
    *
    * Scale shape: the standing sets are hash-layout catalog sets
    * (APPENDABLE — the growth is the point; the write-once bucketed
    * layout of [[persistLshIndex]] refuses appends), with
    * [[recapIngestNearDupIndex]] as the combined compaction +
    * re-cap maintenance pass. Each batch costs one arrival-sized
    * shingle/signature pass, ONE full scan of each standing set plus a
    * column-pruned id read (see [[ingestNearDupBatch]]), and a
    * candidate-sized verify; the sets grow with corpus size exactly
    * like the static index's build side.
    *
    * Replay-safe under foreachBatch's at-least-once contract: emitted
    * pairs are canonical (id_a < id_b) and candidate-deduped, so a
    * re-executed micro-batch emits exactly its first attempt's pairs;
    * the appends are guarded by standing-set membership, so it grows
    * nothing twice and every crash window between or inside the two
    * appends heals on replay ([[ingestNearDupBatch]] enumerates them).
    */
  def streamIngestNearDup(
      stream: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, idCol: String, textCol: String,
      threshold: Double = 0.8, k: Int = 128, bands: Int = 32,
      shingleN: Int = 2,
      sink: Option[(graft.storage.SetCatalog, String, String)] = None): DataFrame =
    streamProbe(stream, batch => ingestNearDupBatch(batch, catalog, db, name,
      idCol, textCol, threshold, k, bands, shingleN), sink)

  /** One micro-batch of [[streamIngestNearDup]]: probe + grow. Public as
    * the batch kernel so the soak harness can drive successive batches
    * directly and time each one against the growing standing set.
    *
    * Standing-set IO per batch — ONE full scan of each standing set
    * (VERDICT r14 next #2; the r14 shape re-scanned both sets for the
    * append anti-joins, 3× standing bytes per batch): the band set is
    * read once by the candidate join, the shingle set once by the
    * verify join, and the replay/append guard below reads only the
    * shingle set's ID COLUMN (a column-pruned parquet read — at 100 TB
    * the shingle payload dwarfs the 8-byte id column, so guard bytes
    * are ~0 of set bytes; PlanSpec pins both the scan counts and the
    * guard's pruned ReadSchema).
    *
    * Replay-safe under foreachBatch's at-least-once contract WITHOUT
    * excluding the batch's ids from the standing side (the r14
    * mechanism, which is what forced the extra scans): candidate pairs
    * are canonicalized to id_a < id_b via least/greatest BEFORE
    * aggregation, so a replayed batch's standing copies produce only
    * (a) self-pairs, dropped by the strict inequality, and (b) copies
    * of the batch's own intra pairs, collapsed by the distinct() on the
    * candidate union — a re-executed micro-batch emits exactly its
    * first attempt's pairs. Canonicalization (not an orientation
    * filter) makes pair discovery DELIVERY-ORDER INDEPENDENT: a
    * standing id larger than the arrival's still pairs (ids may arrive
    * interleaved — the soak's modulo batching does), and emitted
    * orientation can never flip (the oracle-side concern ADVICE r14 #4
    * raised). The verify side therefore resolves BOTH pair columns
    * through one candidate-id shingle lookup ([[ingestNearDupLookup]]).
    *
    * Both appends are guarded by one tiny `replayed` frame (batch ids
    * already present in the standing SHINGLE set, the LAST set the
    * append sequence writes), so every crash window heals on replay:
    * a crash before/inside the bands append re-appends that id's full
    * band rows (duplicates are harmless — the candidate aggregate
    * counts DISTINCT bands, so a healed duplicate can never inflate
    * the ≥2-band rule, closing ADVICE r14 #2's partial-band-append
    * hole); a crash inside the sets append re-appends only the missing
    * ids. Only after BOTH appends land does the guard see the id and
    * skip it.
    */
  def ingestNearDupBatch(
      batch: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, idCol: String, textCol: String,
      threshold: Double = 0.8, k: Int = 128, bands: Int = 32,
      shingleN: Int = 2): DataFrame = {
    val setsName = s"${name}_sets"
    val bandsName = s"${name}_bands"
    // Heal a crashed recap BEFORE reading or appending to the standing
    // sets: a recap that died mid-swap left its group marker, making
    // the STAGED generation authoritative — appending to the doomed old
    // generation instead would be silently discarded when the swap is
    // eventually finished (the recap's own preamble only runs when the
    // recap policy re-fires, which a conf change can prevent forever).
    // Cost on the overwhelmingly common clean path: one marker
    // Files.exists plus two staging-sidecar existence checks.
    catalog.recoverSwapGroup(db, Seq(s"${setsName}_recap" -> setsName,
      s"${bandsName}_recap" -> bandsName))
    val (nSets, nBanded) = bandFrames(batch, idCol,
      wordShingles(col(textCol), shingleN), k, bands)
    val exists = catalog.meta(db, bandsName).nonEmpty
    val standing =
      if (exists) Some((catalog.scanSet(db, setsName),
        catalog.scanSet(db, bandsName)))
      else None
    // the probe is localCheckpointed BEFORE the appends: a lazy
    // recompute after them would find each arrival's own bands in the
    // standing set
    val verified = ingestNearDupProbe(nSets, nBanded, standing, threshold)
      .localCheckpoint(eager = true)
    if (exists) {
      // batch ids the standing shingle set already admitted — a replayed
      // batch appends nothing twice. Checkpointed eagerly (it is at most
      // batch-id-sized) so the two appends share ONE pruned read of the
      // standing id column instead of re-scanning per append.
      val replayed = nSets.select(col("id"))
        .join(catalog.scanSet(db, setsName).select(col("id")),
          Seq("id"), "left_semi")
        .localCheckpoint(eager = true)
      // bands FIRST, sets LAST: the guard keys on sets-presence, so an
      // id is only ever skipped once its whole append sequence finished
      catalog.appendToSet(db, bandsName,
        nBanded.join(replayed, Seq("id"), "left_anti"))
      catalog.appendToSet(db, setsName,
        nSets.join(replayed, Seq("id"), "left_anti"))
    } else {
      catalog.createSet(db, setsName, nSets, partitionColumn = Some("id"))
      catalog.createSet(db, bandsName, nBanded, partitionColumn = Some("bkey"))
    }
    // the standing-pipeline recap policy, opt-in per session: growth-
    // gated census, census-gated recap (see maybeRecapIngestNearDupIndex)
    val autoRecap = batch.sparkSession.conf
      .get("spark.graft.dedup.ingest.autoRecap.growth", "0").toDouble
    if (autoRecap > 0)
      maybeRecapIngestNearDupIndex(catalog, db, name,
        maxBucket = batch.sparkSession.conf
          .get("spark.graft.dedup.ingest.autoRecap.maxBucket", "200").toInt,
        growthFraction = autoRecap)
    nSets.unpersist(blocking = false)
    nBanded.unpersist(blocking = false)
    verified
  }

  /** Candidate half of the ingest probe, LAZY (package-visible so
    * PlanSpec can pin that it scans the standing band set exactly once):
    * the batch's band self-join plus the standing×batch band join,
    * CANONICALIZED to id_a < id_b via least/greatest BEFORE aggregation
    * — so pair orientation is canonical by construction under ANY
    * delivery order (ids need not arrive monotonically; a standing id
    * larger than the arrival's still pairs), and a replayed batch's
    * standing copies can only re-derive its own canonical pairs
    * (self-pairs drop on the strict inequality; duplicates collapse in
    * the distinct()).
    */
  private[graft] def ingestNearDupCandidates(
      nBanded: DataFrame, standingBands: Option[DataFrame]): DataFrame = {
    def cand(joined: DataFrame): DataFrame =
      joined.filter(col("ia") =!= col("ib"))
        .select(least(col("ia"), col("ib")).as("id_a"),
          greatest(col("ia"), col("ib")).as("id_b"), col("band"))
        .groupBy(col("id_a"), col("id_b"))
        // DISTINCT bands, not row count: duplicate standing band rows
        // (the healed footprint of a crash inside a bands append) must
        // never let one real band collision pass the ≥2-band rule
        .agg(count_distinct(col("band")).as("n_bands"))
        .filter(col("n_bands") >= 2)
        .select(col("id_a"), col("id_b"))
    val newB = nBanded.select(col("band"), col("bkey"), col("id").as("ib"))
    val intra = cand(
      nBanded.select(col("band"), col("bkey"), col("id").as("ia"))
        .join(newB, Seq("band", "bkey"))
        // halve the symmetric self-join before grouping; least/greatest
        // is then a no-op for intra rows
        .filter(col("ia") < col("ib")))
    standingBands match {
      case None => intra
      case Some(sBands) => intra.unionByName(cand(
          sBands.select(col("band"), col("bkey"), col("id").as("ia"))
            .join(newB, Seq("band", "bkey"))))
        .distinct()
    }
  }

  /** Shingle-set lookup for the candidate ids, LAZY (package-visible for
    * PlanSpec): the standing shingle set is scanned ONCE, semi-joined
    * down to the ids the candidates actually reference, and unioned with
    * the batch's own sets — because pairs are canonical under unordered
    * delivery, EITHER column of a cross pair can be the standing
    * element, so both verify sides resolve through this one table. On a
    * replay an id exists on both sides with identical content
    * (deterministic shingles of the same text) and either copy serves;
    * when an id is REUSED with different content (outside the replay
    * contract), the ARRIVAL copy wins DETERMINISTICALLY — source-
    * priority min per id, not dropDuplicates' arbitrary survivor — so
    * verify jaccard can never flip between runs on that edge (the r14
    * standing-side exclusion had the same arrival preference; this
    * keeps it under the 1-scan kernel). The window runs over the
    * candidate-id-sized lookup, not the standing set.
    */
  private[graft] def ingestNearDupLookup(
      nSets: DataFrame, standingSets: Option[DataFrame],
      candIds: DataFrame): DataFrame = standingSets match {
    case None => nSets
    case Some(sSets) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("src"))
      nSets.join(candIds, Seq("id"), "left_semi").withColumn("src", lit(0))
        .unionByName(
          sSets.join(candIds, Seq("id"), "left_semi").withColumn("src", lit(1)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("src", "rn")
  }

  /** The probe half of [[ingestNearDupBatch]], side-effect-free:
    * canonical candidate pairs ([[ingestNearDupCandidates]]) verified by
    * exact shingle jaccard against the candidate-id lookup
    * ([[ingestNearDupLookup]]). The candidates and the lookup are
    * localCheckpointed (both candidate-sized — bounded by the ≥2-band
    * rule between recaps) so the lookup's two uses cost ONE standing
    * shingle-set scan, not two.
    */
  private[graft] def ingestNearDupProbe(
      nSets: DataFrame, nBanded: DataFrame,
      standing: Option[(DataFrame, DataFrame)],
      threshold: Double): DataFrame = {
    val cands = ingestNearDupCandidates(nBanded, standing.map(_._2))
      .localCheckpoint(eager = true)
    val candIds = cands.select(col("id_a").as("id"))
      .unionByName(cands.select(col("id_b").as("id"))).distinct()
    val lookup = ingestNearDupLookup(nSets, standing.map(_._1), candIds)
      .localCheckpoint(eager = true)
    cands
      .join(lookup.select(col("id").as("id_a"), col("ws").as("ws_a")),
        Seq("id_a"))
      .join(lookup.select(col("id").as("id_b"), col("ws").as("ws_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("ws_a"), col("ws_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Band-bucket census of a [[streamIngestNearDup]] standing index:
    * (band, bkey, bucket_n) with bucket_n = DISTINCT standing ids in the
    * bucket (duplicates from healed crash windows don't inflate it).
    * This is the dial that says when to run
    * [[recapIngestNearDupIndex]]: an arrival hashing into a bucket of
    * size B emits B candidate rows through that band, so max(bucket_n)
    * bounds the per-arrival candidate cost and Σ bucket_n² bounds a
    * whole self-pass — on a boilerplate-heavy corpus one bucket's
    * growth is the quadratic term the recap removes.
    */
  def ingestBandCensus(
      catalog: graft.storage.SetCatalog, db: String, name: String): DataFrame =
    catalog.scanSet(db, s"${name}_bands")
      .groupBy(col("band"), col("bkey"))
      .agg(count_distinct(col("id")).as("bucket_n"))

  /** The maintenance valve of the self-growing ingest near-dup index
    * (VERDICT r14 next #1 — the r14 scaladoc promised a rebuild that
    * could not exist because [[persistLshIndex]]'s bucketed layout
    * refuses appends; this is the real thing): compact BOTH growing
    * standing sets into a fresh generation, with the static forms'
    * hot-bucket cap re-censused over the accumulated band keys — every
    * (band, bkey) bucket holding more than `maxBucket` distinct ids is
    * dropped from the new generation, exactly [[lshCandidateFrames]]'
    * rule, so a boilerplate bucket that grew quadratic candidate cost
    * is removed in one pass. The recall argument is the static cap's: a
    * true pair at j ≥ threshold collides in ~bands·j^r buckets, so
    * losing the few corpus-hot ones preserves the ≥2-band rule's reach
    * (the sf0.01 oracle equality over the capped static form is the
    * standing evidence).
    *
    * The new generation is STAGED ([[graft.storage.SetCatalog
    * .createSet]] into `*_recap` sets, the same hash layouts the live
    * sets carry) and committed as one crash-atomic
    * [[graft.storage.SetCatalog.swapSetGroup]] — a crash anywhere
    * leaves either the old generation or the new, never a mix, and the
    * recovery preamble here (plus [[graft.storage.SetCatalog
    * .recoverAll]] at catalog open) heals an interrupted recap before
    * the next one runs. Post-swap the sets keep their appendable hash
    * policy, so ingest continues against the recapped generation
    * unchanged — unlike a [[persistLshIndex]] rebuild, whose write-once
    * bucketed output could never ingest again.
    *
    * The rewrite also dedups band rows (healing any duplicate rows a
    * crashed append left — harmless to correctness under the
    * distinct-band candidate count, but dead bytes) and re-tiles both
    * sets to their recorded layouts, subsuming
    * [[graft.storage.SetCatalog.compactSet]] for this index. Cost: one
    * full read+write of the standing sets — the same bill as any
    * compaction; run it on the [[ingestBandCensus]] signal, not a
    * timer.
    *
    * Mid-stream semantics: probes after a recap behave exactly as
    * before it on non-hot buckets (spec-pinned); pairs whose ONLY
    * collisions were in dropped hot buckets stop being found until the
    * docs re-collide elsewhere — the deliberate cap trade.
    */
  def recapIngestNearDupIndex(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      maxBucket: Int = 200): Unit = {
    val setsName = s"${name}_sets"
    val bandsName = s"${name}_bands"
    val pairs = Seq(s"${setsName}_recap" -> setsName,
      s"${bandsName}_recap" -> bandsName)
    catalog.recoverSwapGroup(db, pairs)
    val setsMeta = catalog.meta(db, setsName).getOrElse(
      throw new IllegalArgumentException(
        s"recapIngestNearDupIndex: no ingest index $db.$name"))
    val hot = catalog.scanSet(db, bandsName)
      .groupBy(col("band"), col("bkey"))
      .agg(count_distinct(col("id")).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
      .select(col("band"), col("bkey"))
    val capped = catalog.scanSet(db, bandsName)
      .join(broadcast(hot), Seq("band", "bkey"), "left_anti")
      .distinct()
    // stage the new generation (reads run against the still-live old
    // directories; createSet writes to the separate *_recap paths)
    catalog.createSet(db, s"${setsName}_recap",
      catalog.scanSet(db, setsName),
      partitionColumn = setsMeta.partitionColumn)
    catalog.markStaging(db, s"${setsName}_recap")
    catalog.createSet(db, s"${bandsName}_recap", capped,
      partitionColumn = catalog.meta(db, bandsName).flatMap(_.partitionColumn))
    catalog.markStaging(db, s"${bandsName}_recap")
    catalog.swapSetGroup(db, pairs)
    stampIngestCensusRows(catalog, db, name)
  }

  /** Record "rows the band set held when its census was last known
    * clean" — the ANN tiers' `_built` sidecar pattern applied to the
    * recap policy, so [[ingestGrowthFraction]] is two O(1) sidecar
    * reads, never a scan.
    */
  private def stampIngestCensusRows(
      catalog: graft.storage.SetCatalog, db: String, name: String): Unit = {
    val spark = catalog.scanSet(db, s"${name}_bands").sparkSession
    import spark.implicits._
    val rows = catalog.meta(db, s"${name}_bands").map(_.rows).getOrElse(0L)
    catalog.createSet(db, s"${name}_censused",
      Seq(rows).toDF("rows_at_census"), policy = "none")
  }

  /** Fraction the standing band set has GROWN since its census was last
    * known clean ((rows_now − rows_then)/rows_then) — two sidecar
    * reads, O(1). 0.0 for indexes grown before the marker existed (they
    * opt in at their first census/recap), ∞-ish growth reads large.
    */
  def ingestGrowthFraction(
      catalog: graft.storage.SetCatalog, db: String, name: String): Double = {
    val now = catalog.meta(db, s"${name}_bands").map(_.rows).getOrElse(0L)
    if (catalog.meta(db, s"${name}_censused").isEmpty) 0.0
    else {
      val base = catalog.scanSet(db, s"${name}_censused")
        .collect()(0).getLong(0)
      if (base <= 0) 0.0 else (now - base).toDouble / base
    }
  }

  /** The recap POLICY — "recap on census, not on a timer", as code: a
    * census is itself a full band-set scan, so it runs only once the
    * standing side has GROWN by `growthFraction` since the last clean
    * census (an O(1) sidecar check); if the census then finds a bucket
    * above `maxBucket`, the full [[recapIngestNearDupIndex]] runs;
    * otherwise the clean census is stamped and nothing rewrites.
    * Returns true iff a recap ran. Wire it per-batch via
    * `spark.graft.dedup.ingest.autoRecap.growth` (a fraction; 0 = off,
    * the default) — [[ingestNearDupBatch]] calls this after its appends,
    * so a standing pipeline's hot buckets are bounded by
    * (cap at last census) × (1 + growthFraction) with no operator
    * remembering the maintenance call.
    */
  def maybeRecapIngestNearDupIndex(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      maxBucket: Int = 200, growthFraction: Double = 1.0): Boolean = {
    require(growthFraction > 0, "growthFraction must be positive")
    if (catalog.meta(db, s"${name}_censused").isDefined &&
        ingestGrowthFraction(catalog, db, name) < growthFraction) false
    else {
      val worst = ingestBandCensus(catalog, db, name)
        .agg(coalesce(max(col("bucket_n")), lit(0L))).collect()(0).getLong(0)
      if (worst > maxBucket) {
        recapIngestNearDupIndex(catalog, db, name, maxBucket)
        true
      } else {
        stampIngestCensusRows(catalog, db, name)
        false
      }
    }
  }

  /** Shared per-micro-batch probe harness for the streaming ingest-dedup
    * forms: run `perBatch` on every micro-batch, appending results to the
    * catalog `sink` when given (the production form — the log set is
    * created if missing and APPENDED to if present, the restart
    * semantics a standing pipeline needs), else accumulating
    * driver-side localCheckpoints (the oracle-harness convenience). The
    * sink/restart/empty-stream semantics live HERE once, so the three
    * streaming families cannot drift apart.
    */
  private[graft] def streamProbe(
      stream: DataFrame, perBatch: DataFrame => DataFrame,
      sink: Option[(graft.storage.SetCatalog, String, String)]): DataFrame = {
    val (q, result) = startProbe(stream, perBatch, sink)
    try q.processAllAvailable() finally q.stop()
    result()
  }

  /** [[streamProbe]] without the drain: start the foreachBatch query and
    * return it alongside the result thunk, so the caller controls WHEN
    * batches process — the harness the mid-stream lifecycle specs need
    * to interleave index maintenance (an append, a rebuild, a recap)
    * between micro-batches of a LIVE probe stream and pin the per-batch
    * re-resolution contract directly. Production callers use
    * [[streamProbe]]; this exists because `processAllAvailable` inside
    * it drains everything already queued, leaving no seam for a test to
    * mutate the standing index mid-stream.
    */
  private[graft] def startProbe(
      stream: DataFrame, perBatch: DataFrame => DataFrame,
      sink: Option[(graft.storage.SetCatalog, String, String)])
      : (org.apache.spark.sql.streaming.StreamingQuery, () => DataFrame) = {
    val spark = stream.sparkSession
    def emptyOut = perBatch(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stream.schema))
    sink.foreach { case (cat, db, set) =>
      if (cat.meta(db, set).isEmpty)
        cat.createSet(db, set, emptyOut, policy = "none")
    }
    var acc: Option[DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val out = perBatch(batch.toDF())
        sink match {
          case Some((cat, db, set)) => cat.appendToSet(db, set, out)
          case None =>
            acc = Some(acc.map(_.unionByName(out)).getOrElse(out)
              .localCheckpoint(eager = true))
        }
        ()
      }
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    (q, () => sink match {
      case Some((cat, db, set)) => cat.scanSet(db, set)
      case None => acc.getOrElse(
        // empty stream: an empty-input run of the same plan, for the schema
        emptyOut)
    })
  }

  /** Streaming form of [[spansAgainstStoredIndex]] — per-micro-batch
    * probe of the CATALOG-PERSISTED gram index, completing streaming
    * parity for the span family (the whole-doc analogue is
    * [[streamNearDupPairs]]). Batching-invariant by construction: each
    * arriving doc's spans depend only on that doc plus the static index
    * (the span epilogue's gaps-and-islands window partitions by doc), so
    * any batching unions to the one-shot result. Same two accumulation
    * modes as [[streamNearDupPairs]]: with `sink`, per-batch spans APPEND
    * to a stored set (the production form); without, the log accumulates
    * as driver-held checkpoints and returns when the stream drains (the
    * oracle-query form).
    *
    * LIVE-INDEX contract (shared by every stored-index probe stream —
    * see [[streamSemanticAgainstIndex]] for the full statement): the
    * gram index is re-resolved INSIDE the batch closure, so an index
    * re-persisted or swapped between micro-batches is what the next
    * batch probes — a plan captured at stream start would pin the
    * original file listing for the stream's whole life.
    */
  def streamSpansAgainstStoredIndex(
      stream: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, idCol: String, textCol: String,
      k: Int = 8,
      sink: Option[(graft.storage.SetCatalog, String, String)] = None): DataFrame =
    streamProbe(stream, spansProbeFn(catalog, db, name, idCol, textCol, k),
      sink)

  /** Per-batch probe closure of [[streamSpansAgainstStoredIndex]],
    * package-visible so the mid-stream lifecycle specs can drive it
    * through [[startProbe]].
    */
  private[graft] def spansProbeFn(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      idCol: String, textCol: String, k: Int): DataFrame => DataFrame =
    batch => spansAgainstGrams(batch, scanGramIndex(catalog, db, name),
      idCol, textCol, k)

  /** Connected components over a near-dup pair set — the step a dedup
    * pipeline runs after pair generation so each cluster keeps one
    * representative. Every id appearing in a pair is labeled with the
    * SMALLEST id reachable through the pair graph (its cluster id).
    *
    * Two regimes, like [[graft.la.BlockMatrix]]'s size-gated inverse:
    * the pair graph is orders smaller than the corpus (LSH emits only
    * verified near-dup pairs), so when it fits comfortably on the driver
    * (≤ `spark.graft.dedup.cc.driverMaxPairs`, default 4M, long ids) a
    * single-pass union-find replaces O(diameter) Spark jobs — the
    * iterative path costs ~2 s of scheduler/shuffle overhead PER PASS
    * regardless of data size, which dominated the bench. Above the gate
    * (billions of pairs at 100 TB) the distributed min-label loop below
    * is the scale path.
    *
    * Distributed path: each iteration is symmetrized-edges ⋈ labels +
    * min-aggregate, PLUS a pointer-doubling shortcut (each node also
    * adopts its current label's label — valid because a min-label is
    * itself a node of the same component, so labels(label) is defined
    * and reachable). Propagation alone needs O(component diameter)
    * passes; the shortcut halves the remaining label-tree depth each
    * pass, so convergence is O(log diameter) — a 1000-link duplicate
    * chain settles in ~10 passes, not 1000. Cost per pass: one shuffle
    * join + agg over the PAIR graph (documents in no pair never enter)
    * and one self-join over the label table. Each pass eagerly
    * checkpoints — the convergence check is a driver action anyway,
    * mirroring the reference's client-side iteration (SURVEY.md §2.6).
    */
  /** Diagnostic: passes the last distributed [[dupClusters]] run took to
    * converge (−1 when the driver union-find regime answered instead).
    * Read by graft.Soak to report the measured pass count against the
    * O(log diameter) bound.
    */
  @volatile private[graft] var lastCcPasses: Int = -1

  def dupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    val longIds = pairs.schema.fields.take(2).forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    val gate = spark.conf
      .get("spark.graft.dedup.cc.driverMaxPairs", "4000000").toLong
    if (longIds) {
      val p = pairs.select(col("id_a"), col("id_b")).persist()
      val n = p.count()
      if (n <= gate) {
        val edges = p.collect().map(r => (r.getLong(0), r.getLong(1)))
        p.unpersist(blocking = false)
        lastCcPasses = -1
        import spark.implicits._
        return unionFindMinLabel(edges).toSeq
          .toDF("doc_id", "cluster_id")
      }
      p.unpersist(blocking = false)
    }
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val msgs = edges.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min(col("label")).as("nbr_min"))
      // pointer doubling: label(label) for every node — min-labels are
      // nodes of the same component, so the self-join always resolves
      val viaParent = labels.join(
        labels.select(col("id").as("label"), col("label").as("grand")),
        Seq("label"), "left_outer")
        .select(col("id"), col("label"),
          coalesce(col("grand"), col("label")).as("grand"))
      val next = viaParent.join(msgs, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("label"), col("grand"),
            coalesce(col("nbr_min"), col("label"))).as("label"),
          (coalesce(col("nbr_min") < col("label"), lit(false)) ||
            col("grand") < col("label")).as("chg"))
        .localCheckpoint(eager = true)
      changed = next.filter(col("chg")).count()
      labels = next.select(col("id"), col("label"))
      i += 1
    }
    edges.unpersist(blocking = false)
    lastCcPasses = i
    // min-label propagation converges in O(component diameter) passes; a
    // silent exit with labels still moving would return WRONG cluster ids
    // for long duplicate chains, so non-convergence is an error, not a
    // best-effort answer (raise maxIters — or the driver gate — for
    // pathological chain-shaped corpora)
    if (changed > 0)
      throw new IllegalStateException(
        s"dupClusters did not converge after $maxIters passes " +
          s"($changed labels still changing): a duplicate-pair component " +
          "has diameter > maxIters; raise maxIters")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Path-compressed union-find linking the larger root under the
    * smaller, so every component's root IS its minimum id — the same
    * labeling the distributed loop converges to.
    */
  private def unionFindMinLabel(
      edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    parent.keysIterator.map(k => (k, find(k))).toArray
  }

  /** SimHash near-dup: 61-bit signature whose bits are the sign of the
    * per-bit-position vote over token hashes; near-dups = small Hamming
    * distance. Banded into 16-bit quarters for the candidate join
    * (hamming ≤ 3 ⇒ at least one identical quarter, pigeonhole — still
    * holds with the top quarter carrying 13 meaningful bits).
    *
    * The word hash is the same Rabin-Karp recurrence as
    * [[TextAnalysis.fingerprint64]] (h·257+c mod 2⁶¹−1) rather than an
    * opaque JVM hash, so the DuckDB oracle can reproduce the full result
    * with HUGEINT modular arithmetic — upgrading this operator from a
    * rows-only check to a hash-checked one.
    */
  val simhash64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (words: Seq[String]) =>
      val votes = new Array[Int](61)
      words.foreach { w =>
        // 61-bit rolling polynomial word hash — the shared kernel behind
        // the fingerprint expression
        val h = graft.functions.HashKernel.rolling61(w)
        var i = 0
        while (i < 61) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      var out = 0L
      var i = 0
      while (i < 61) { if (votes(i) > 0) out |= (1L << i); i += 1 }
      out
    }

  /** Hot-bucket cap (mirrors [[lshCandidateFrames]]'s `maxBucket`): a
    * quarter value shared by a corpus-common template region can put a
    * large fraction of all documents in one bucket, making the self-join
    * quadratic in that bucket. Quarter buckets above `maxBucket` are
    * dropped from BOTH join sides. Recall trade, precisely: a pair at
    * hamming ≤ 2 shares ≥ 2 quarters (pigeonhole), so a single hot
    * quarter can never hide it; only a hamming-3 pair whose three
    * differing bits land in three DISTINCT quarters — leaving exactly one
    * shared quarter — AND whose one shared quarter is a hot template
    * value can be missed. Hot quarters are by construction the
    * non-discriminative ones, so this is the same trade as minhash LSH's
    * super-bucket drop; the sf0.01 oracle equality (cap never engaged at
    * fixture scale) plus the skew-planted soak row validate both sides.
    */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 200): DataFrame = {
    // single-file corpus → one scan partition; spread the UDF work.
    // Persisted: the (id, sh) scalars feed the hot-bucket scan and both
    // self-join sides — without the cache the per-doc UDF runs 3×. Under
    // materialize=none the cache would be unreachable by the caller (the
    // mode's unpersist contract), so skip it and pay the recompute.
    val sh0 = Parallelism.ensureWidth(docs)
      .select(col(idCol).as("id"),
        simhash64(wordSet(col(textCol))).as("sh"))
    val sh =
      if (docs.sparkSession.conf
          .get("spark.graft.dedup.materialize", "localCheckpoint") == "none") sh0
      else sh0.persist()
    val banded = sh.select(col("id"), col("sh"),
      explode(array((0 until 4).map(q => struct(lit(q).as("q"),
        shiftrightunsigned(col("sh"), q * 16)
          .bitwiseAND(lit(0xffffL)).as("qv"))): _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.q").as("q"), col("bk.qv").as("qv"))
    val hot = banded.groupBy(col("q"), col("qv"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
      .select(col("q"), col("qv"))
    val pruned = banded.join(broadcast(hot), Seq("q", "qv"), "left_anti")
    val a = pruned.select(col("q"), col("qv"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = pruned.select(col("q"), col("qv"), col("id").as("id_b"), col("sh").as("sh_b"))
    val out = a.join(b, Seq("q", "qv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
    materialize(out, sh)
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH cosine near-dup pairs —
    * the scale path for embedding dedup. Signature bit j = sign(v·h_j)
    * with deterministic pseudo-random hyperplanes; P(bit match) =
    * 1 − θ/π, so banding concentrates candidates on high-cosine pairs.
    * Candidates are verified with the exact cosine, so precision is 1;
    * recall is 1 − (1 − p^r)^b per pair.
    *
    * Regime note (why the defaults are 512 bits / r=16): hyperplane LSH
    * separates near-dups from background only when the threshold is far
    * above the corpus' typical similarity. At threshold 0.95 and
    * background |cos|≈0.1, r=16-bit bands give a 4e-5 background band
    * hit rate (subquadratic candidates) while 32 bands keep recall at
    * 99.8%. Low thresholds (≤0.5) on near-uniform corpora degenerate to
    * quadratic candidates — use [[cosinePairs]] (brute force) or IVF
    * bucketing there.
    */
  def cosineLshPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nBits: Int = 512, rowsPerBand: Int = 16): DataFrame = {
    require(nBits % rowsPerBand == 0, "rowsPerBand must divide nBits")
    require(rowsPerBand <= 64, "a band key must fit in one long")
    val bands = nBits / rowsPerBand
    val nb = nBits
    val rpb = rowsPerBand
    // One UDF pass emits the 32 band keys directly — each key is the
    // band's r sign bits packed into a long (no separate hashing, and no
    // 512-node bit-extraction expression tree, which dominated planning
    // and codegen time in the relational formulation).
    val bandKeys = udf(new (Seq[Float] => Seq[Long]) with Serializable {
      // Deterministic hyperplanes: component i of plane j from one
      // splitmix64 mix of (j, i), mapped to [-1, 1) — symmetric around 0,
      // which is all sign-hashing needs. Materialized ONCE per
      // deserialized closure (i.e. per task), NOT per row: at nBits=512 ×
      // dim=1024 the matrix is 4 MB of doubles and recomputing it per row
      // would multiply the projection cost ~3×.
      @transient private var planes: Array[Array[Double]] = _
      private def mkPlanes(dim: Int): Array[Array[Double]] =
        Array.tabulate(nb, dim) { (j, i) =>
          var z = (j.toLong * 1000003L + i) + 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z = z ^ (z >>> 31)
          z.toDouble / 9.223372036854776e18 // [-1, 1)
        }
      override def apply(v: Seq[Float]): Seq[Long] = {
        val arr = v.toArray
        if (planes == null || planes(0).length != arr.length)
          planes = mkPlanes(arr.length)
        val keys = new Array[Long](nb / rpb)
        var j = 0
        while (j < nb) {
          val h = planes(j)
          var acc = 0.0
          var i = 0
          while (i < arr.length) { acc += arr(i) * h(i); i += 1 }
          if (acc > 0) keys(j / rpb) |= (1L << (j % rpb))
          j += 1
        }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(keys)
      }
    })
    val withSig = Parallelism.ensureWidth(emb)
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        l2Norm(col(vecCol)).as("nrm"), bandKeys(col(vecCol)).as("keys"))
      .persist()
    val banded = withSig
      .select(col("id"), posexplode(col("keys")).as(Seq("band", "bkey")))
    val a = banded.select(col("band"), col("bkey"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bkey"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val out = candidates
      .join(withSig.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a")), Seq("id_a"))
      .join(withSig.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b")), Seq("id_b"))
      .withColumn("cos", round(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
    materialize(out, withSig)
  }

  /** Embedding cosine near-dup pairs. Brute-force all-pairs baseline —
    * correct at any scale but O(n²); the scale path is
    * [[cosineLshPairs]] (hyperplane LSH) or
    * [[SimilaritySearch.ivfTopK]]-style bucketing.
    */
  /** Duplicate k-gram SPANS — substring-level exact dedup (the
    * "deduplicate repeated passages, not documents" family, here as
    * hashed k-token windows rather than a suffix array): a window of `k`
    * consecutive tokens is duplicated when it occurs at ≥2 (doc,
    * position) sites corpus-wide, and overlapping duplicated windows
    * merge into maximal per-document spans. This finds repeated PASSAGES
    * — boilerplate, licenses, quoted blocks — inside otherwise-unique
    * documents, the case every whole-doc operator above
    * ([[minhashPairs]] and friends) misses by construction.
    *
    * Scale shape: windows are one generate-and-explode projection —
    * O(total tokens) rows, no join to build them; the duplicate test
    * groups on the window's md5 fingerprint (map-side partial count, and
    * the fixed 16-byte binary key bounds shuffle payload no matter how wide the
    * window text is); span merging is a per-document gaps-and-islands
    * window (partitionBy doc → millions of independent partitions at
    * corpus scale, never a global sort). Output: (idCol, span_start,
    * span_end, span_tokens), 0-based inclusive token indices.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val wins = windowFingerprints(docs, idCol, textCol, k)
    val dup = wins.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("g"))
    spanIslands(wins.join(dup, Seq("g"), "left_semi"), idCol, k)
  }

  /** Shared span epilogue — gaps-and-islands over duplicated window
    * start positions: consecutive positions share one (pos - rank)
    * value, so each island is a maximal duplicated span. One window per
    * document; `hits` carries (id, pos).
    */
  private def spanIslands(hits: DataFrame, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    hits
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1).cast("long")).as("span_end"))
      .select(col("id").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Ingest-time span dedup — the standing-pipeline form of
    * [[duplicateSpans]], mirroring [[persistLshIndex]] /
    * [[crossPairsAgainstStoredIndex]] for whole-doc dedup: the corpus's
    * DISTINCT window fingerprints persist once as a bucketed set keyed
    * on the fingerprint, and each arriving batch semi-joins its own
    * windows against it — the index side arrives pre-partitioned on the
    * join key (zero exchange), the arrival side shuffles only its
    * 16-byte fingerprints. Per-doc results depend only on that doc and
    * the static index, so per-batch outputs union to the one-shot
    * result.
    */
  /** Same bucket-count choice as [[persistLshIndex]]: explicit wins,
    * then the advisor's sizing rule over the distinct-gram count, then
    * the session shuffle-partition default. The gram frame persists
    * around the advisor's count so the fingerprint pipeline runs once.
    */
  def persistGramIndex(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 8, numBuckets: Int = 0,
      advisor: Option[graft.advisor.PlacementAdvisor] = None,
      targetRowsPerBucket: Long = 1L << 22): Unit = {
    val grams = windowFingerprints(corpus, idCol, textCol, k)
      .select(col("g")).distinct()
    // both auto paths persist + count so the fingerprint pipeline runs
    // once; the no-advisor default sizes from that count instead of the
    // session's shuffle-partition constant (see bucketCountFor)
    val n = if (numBuckets > 0) numBuckets
      else {
        grams.persist()
        advisor match {
          case Some(a) =>
            a.recommendBuckets(s"$db.${name}_grams", grams.count(),
              targetRowsPerBucket)
          case None =>
            graft.advisor.PlacementAdvisor
              .bucketCountFor(grams.count(), targetRowsPerBucket)
        }
      }
    catalog.createBucketedSet(db, s"${name}_grams", grams, "g", n)
    if (numBuckets == 0) grams.unpersist(blocking = false)
  }

  /** Persist an exact-content fingerprint index: one row per DISTINCT
    * 16-byte md5 of the corpus text, bucketed on the fingerprint so
    * every later arrival batch probes it with zero index-side exchange.
    * The EXACT-match analogue of [[persistLshIndex]] — the cheapest
    * standing dedup structure a 100 TB ingest keeps warm (128-bit
    * fingerprints: collision odds are negligible at any corpus size,
    * unlike a 64-bit hash's birthday bound). Bucket-count choice matches
    * the other index builders: explicit, else advisor, else session
    * default.
    */
  def persistExactIndex(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      corpus: DataFrame, textCol: String, numBuckets: Int = 0,
      advisor: Option[graft.advisor.PlacementAdvisor] = None,
      targetRowsPerBucket: Long = 1L << 22): Unit = {
    val hashes = corpus.filter(col(textCol).isNotNull)
      .select(unhex(md5(col(textCol))).as("h")).distinct()
    // same auto-sizing shape as persistGramIndex: persist + count once,
    // size buckets from the data with or without an advisor
    val n = if (numBuckets > 0) numBuckets
      else {
        hashes.persist()
        advisor match {
          case Some(a) =>
            a.recommendBuckets(s"$db.${name}_hashes", hashes.count(),
              targetRowsPerBucket)
          case None =>
            graft.advisor.PlacementAdvisor
              .bucketCountFor(hashes.count(), targetRowsPerBucket)
        }
      }
    catalog.createBucketedSet(db, s"${name}_hashes", hashes, "h", n)
    if (numBuckets == 0) hashes.unpersist(blocking = false)
  }

  /** Every arriving doc annotated with whether its EXACT content already
    * exists in the stored index: (idCol, is_dup). The keep-side filter
    * is `!is_dup`; returning the full annotation keeps the drop decision
    * (and its audit trail) with the caller. Per-doc results depend only
    * on that doc and the static index, so per-batch outputs union to the
    * one-shot result.
    */
  def exactAgainstStoredIndex(
      newDocs: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, idCol: String, textCol: String): DataFrame =
    exactAgainstHashes(newDocs, scanExactIndex(catalog, db, name),
      idCol, textCol)

  /** Scan a [[persistExactIndex]] set, failing FAST on a non-binary
    * fingerprint column (same rationale as the gram-index guard: a
    * schema-drifted index would silently match nothing).
    */
  private[graft] def scanExactIndex(
      catalog: graft.storage.SetCatalog, db: String, name: String): DataFrame = {
    val hashes = catalog.scanBucketedSet(db, s"${name}_hashes")
    require(hashes.schema("h").dataType ==
        org.apache.spark.sql.types.BinaryType,
      s"exact index $db.${name}_hashes stores ${hashes.schema("h").dataType} " +
        "fingerprints; rebuild it with persistExactIndex")
    hashes
  }

  /** In-memory form of [[exactAgainstStoredIndex]]: `corpusHashes` is any
    * frame exposing the 16-byte fingerprint column `h` — it need not be
    * distinct (the probe deduplicates it, so a fingerprint appearing
    * three times in the corpus still flags an arrival exactly once; for
    * a [[persistExactIndex]] set, already distinct and bucketed on `h`,
    * that aggregate groups on the bucket key and plans exchange-free).
    * A null arrival text fingerprints to null and never matches
    * (is_dup = false), the same contract as SQL equality.
    */
  def exactAgainstHashes(
      newDocs: DataFrame, corpusHashes: DataFrame,
      idCol: String, textCol: String): DataFrame =
    exactAgainstHashesKeyed(newDocs, corpusHashes, Seq(idCol), textCol)

  /** [[exactAgainstHashes]] for rows identified by a COMPOSITE key — the
    * probe a sub-document unit needs (a sampled video frame is
    * (doc_id, frame_no), not a doc_id). `contentCol` may be string or
    * binary; both fingerprint through the same 16-byte md5 as the index
    * build, so the index machinery stays content-agnostic.
    */
  def exactAgainstHashesKeyed(
      newRows: DataFrame, corpusHashes: DataFrame,
      keyCols: Seq[String], contentCol: String): DataFrame =
    probeMembership(
      newRows.select(keyCols.map(col) :+ unhex(md5(col(contentCol))).as("h"): _*),
      corpusHashes, keyCols, "h")

  /** Shared membership probe: rows (keyCols*, keyName) left-joined
    * against the distinct corpus keys → (keyCols*, is_dup). One
    * definition of the probe contract (null key never matches, corpus
    * side deduplicated so a repeated corpus key flags once) for both
    * the md5 and long-fingerprint index families.
    */
  private def probeMembership(
      newKeyed: DataFrame, corpusKeys: DataFrame,
      keyCols: Seq[String], keyName: String): DataFrame =
    newKeyed
      .join(corpusKeys.select(col(keyName)).distinct()
          .select(col(keyName), lit(true).as("hit")),
        Seq(keyName), "left")
      .select(keyCols.map(col) :+
        coalesce(col("hit"), lit(false)).as("is_dup"): _*)

  /** Persist a standing index of FIXED-WIDTH LONG fingerprints — the
    * [[persistExactIndex]] analogue for content whose fingerprint is an
    * engine-computed long (the 63-bit audio envelope fp) rather than an
    * md5 of the bytes. One row per DISTINCT fingerprint, bucketed on it,
    * so later arrival batches probe with zero index-side exchange; an
    * 8-byte key shuffles even lighter than the 16-byte md5. Same
    * bucket-count policy as the other index builders: explicit, else
    * advisor, else session default.
    */
  def persistFingerprintIndex(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      fps: DataFrame, fpCol: String, numBuckets: Int = 0,
      advisor: Option[graft.advisor.PlacementAdvisor] = None,
      targetRowsPerBucket: Long = 1L << 22): Unit = {
    require(fps.schema(fpCol).dataType ==
        org.apache.spark.sql.types.LongType,
      s"fingerprint column $fpCol is ${fps.schema(fpCol).dataType}; " +
        "persistFingerprintIndex stores LONG fingerprints")
    val distinct = fps.filter(col(fpCol).isNotNull)
      .select(col(fpCol).as("fp")).distinct()
    // same auto-sizing shape as persistGramIndex: persist + count once,
    // size buckets from the data with or without an advisor
    val n = if (numBuckets > 0) numBuckets
      else {
        distinct.persist()
        advisor match {
          case Some(a) =>
            a.recommendBuckets(s"$db.${name}_fps", distinct.count(),
              targetRowsPerBucket)
          case None =>
            graft.advisor.PlacementAdvisor
              .bucketCountFor(distinct.count(), targetRowsPerBucket)
        }
      }
    catalog.createBucketedSet(db, s"${name}_fps", distinct, "fp", n)
    if (numBuckets == 0) distinct.unpersist(blocking = false)
  }

  /** Scan a [[persistFingerprintIndex]] set, failing FAST on a non-long
    * fingerprint column (a schema-drifted index would silently match
    * nothing — same guard as [[scanExactIndex]]).
    */
  private[graft] def scanFingerprintIndex(
      catalog: graft.storage.SetCatalog, db: String, name: String): DataFrame = {
    val fps = catalog.scanBucketedSet(db, s"${name}_fps")
    require(fps.schema("fp").dataType ==
        org.apache.spark.sql.types.LongType,
      s"fingerprint index $db.${name}_fps stores ${fps.schema("fp").dataType} " +
        "fingerprints; rebuild it with persistFingerprintIndex")
    fps
  }

  /** Rows annotated with whether their long fingerprint already exists in
    * `corpusFps` — the [[exactAgainstHashesKeyed]] analogue for
    * engine-computed fingerprints: (keyCols*, is_dup). The corpus side
    * need not be distinct (the probe deduplicates it; for a
    * [[persistFingerprintIndex]] set, already distinct and bucketed on
    * `fp`, that aggregate groups on the bucket key and plans
    * exchange-free). A null fingerprint never matches.
    */
  def fingerprintsAgainstFps(
      newRows: DataFrame, corpusFps: DataFrame,
      keyCols: Seq[String], fpCol: String): DataFrame =
    probeMembership(
      newRows.select(keyCols.map(col) :+ col(fpCol).as("fp"): _*),
      corpusFps, keyCols, "fp")

  /** Streaming form of [[exactAgainstStoredIndex]]: each micro-batch of
    * the ingest stream probes the persisted hash index and its
    * flags are appended (to `sink` when given, else a driver-side
    * accumulation for the test harness — same convenience/production
    * split as [[streamNearDupPairs]]). Batching-invariant by
    * construction: is_dup depends only on the doc itself and the index
    * generation current at its batch, so per-batch outputs union to the
    * one-shot batch result no matter how arrivals are split.
    *
    * LIVE-INDEX contract: the hash index is re-resolved INSIDE the
    * batch closure (see [[streamSemanticAgainstIndex]]), so a
    * re-persisted index generation is what the next micro-batch probes.
    */
  def streamExactAgainstStoredIndex(
      stream: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, idCol: String, textCol: String,
      sink: Option[(graft.storage.SetCatalog, String, String)] = None): DataFrame =
    streamProbe(stream, exactProbeFn(catalog, db, name, idCol, textCol), sink)

  /** Per-batch probe closure of [[streamExactAgainstStoredIndex]],
    * package-visible for the mid-stream lifecycle specs.
    */
  private[graft] def exactProbeFn(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      idCol: String, textCol: String): DataFrame => DataFrame =
    batch => exactAgainstHashes(batch, scanExactIndex(catalog, db, name),
      idCol, textCol)

  /** SELF-GROWING streaming ingest dedup — first-seen-wins over the
    * arrival stream ITSELF, not against a frozen corpus: each micro-batch
    * keeps one representative per exact content (the minimum-id arrival,
    * intra-batch), drops everything whose fingerprint the STANDING set
    * has already admitted (cross-batch), and appends the survivors'
    * fingerprints so every later batch dedups against everything that
    * came before. This is the ingest-pipeline semantics the static-index
    * forms can't express: [[streamExactAgainstStoredIndex]] flags
    * arrivals against a fixed corpus and two identical arrivals BOTH
    * pass; here the second is dropped because the first grew the index.
    *
    * Equivalence contract: under ordered delivery (the ingest-log
    * contract [[graft.operators.Curation.streamTokenBudget]] documents —
    * ids arrive non-decreasing across batches), the admitted set is
    * exactly the batch rule "minimum id per distinct content", for ANY
    * batching (spec-pinned). Under unordered delivery the weaker
    * invariant still holds: exactly one representative per content.
    *
    * Scale shape: the standing set is a hash-layout catalog set keyed on
    * the 16-byte fingerprint — APPENDABLE (unlike the write-once bucketed
    * sets the static probes use; growth is the point here), with
    * [[graft.storage.SetCatalog.compactSet]] as the periodic maintenance
    * pass for the accumulated micro-batch files. Each batch costs one
    * arrival-sized aggregate + one join against the standing set + an
    * O(survivors) append; the set grows with DISTINCT content only. The
    * probe frame is localCheckpointed BEFORE the append — recomputing
    * it lazily after the append would find the arrivals' own just-added
    * fingerprints and emit nothing.
    *
    * REPLAY-SAFE under foreachBatch's at-least-once contract: the
    * standing set records (fingerprint, CLAIMING id), not the bare
    * fingerprint, so a re-executed micro-batch recognizes its own prior
    * claims — a winner whose standing claim carries its own id is
    * re-emitted (same output as the first attempt) instead of
    * anti-joined away, and only unclaimed fingerprints append (the
    * append is idempotent).
    */
  def streamIngestExactDedup(
      stream: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, idCol: String, textCol: String,
      sink: Option[(graft.storage.SetCatalog, String, String)] = None): DataFrame =
    streamProbe(stream,
      batch => ingestExactDedupBatch(batch, catalog, db, name, idCol,
        textCol),
      sink)

  /** One micro-batch of [[streamIngestExactDedup]]: probe + grow. Public
    * as the batch kernel (like [[ingestNearDupBatch]]) so the
    * maintenance-composition soak can drive successive batches directly
    * and inject crashes between them.
    */
  def ingestExactDedupBatch(
      batch: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, idCol: String, textCol: String): DataFrame = {
    val setName = s"${name}_hashes"
    locally {
      val keyed = batch.filter(col(textCol).isNotNull)
        .select(col(idCol), unhex(md5(col(textCol))).as("h"))
      // intra-batch first-wins: the minimum id per fingerprint
      val winners = keyed.groupBy(col("h")).agg(min(col(idCol)).as(idCol))
      val idType = winners.schema(idCol).dataType
      val probed = (catalog.meta(db, setName) match {
        case Some(_) =>
          // merged-schema read: an upgraded-in-place legacy set holds
          // bare-fingerprint files NEXT TO claim-column files, and the
          // default read infers the schema from an arbitrary file — the
          // claim column (and with it the replay re-emission guarantee)
          // would be visible nondeterministically (ADVICE r14 #1). With
          // merging, mixed directories always expose the claim column;
          // legacy rows carry a null claim, which probes as "hit,
          // claimant unknown" — the duplicate still drops.
          val standing = catalog.scanSetMerged(db, setName)
          // all-legacy sets (no file carries the column) still probe —
          // only the replay re-emission needs the claiming id. New
          // appends carry the claim column from here on.
          val claims =
            if (standing.columns.contains(idCol))
              standing.select(col("h"), col(idCol).as("__claimed"),
                lit(true).as("__hit"))
            else standing.select(col("h"),
              lit(null).cast(idType).as("__claimed"), lit(true).as("__hit"))
          winners.join(claims, Seq("h"), "left")
        case None => winners
          .withColumn("__claimed", lit(null).cast(idType))
          .withColumn("__hit", lit(null).cast("boolean"))
      }).localCheckpoint(eager = true)
      val fresh = probed.filter(col("__hit").isNull)
        .select(col("h"), col(idCol))
      catalog.meta(db, setName) match {
        case Some(_) => catalog.appendToSet(db, setName, fresh)
        case None => catalog.createSet(db, setName, fresh,
          partitionColumn = Some("h"))
      }
      probed
        .filter(col("__hit").isNull || col("__claimed") === col(idCol))
        .select(col(idCol))
    }
  }

  /** Spans of `newDocs` whose windows already occur in the stored gram
    * index: (idCol, span_start, span_end, span_tokens) per arriving doc.
    */
  def spansAgainstStoredIndex(
      newDocs: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, idCol: String, textCol: String,
      k: Int = 8): DataFrame =
    spansAgainstGrams(newDocs, scanGramIndex(catalog, db, name),
      idCol, textCol, k)

  /** Scan a [[persistGramIndex]] set, failing FAST if the stored
    * fingerprint column isn't 16-byte binary (an index persisted by a
    * pre-binary-key build stores 32-char hex strings; joining binary
    * probes against it would silently match nothing — a total recall
    * collapse — so a loud rebuild demand is the only safe behavior).
    */
  private def scanGramIndex(
      catalog: graft.storage.SetCatalog, db: String, name: String): DataFrame = {
    val grams = catalog.scanBucketedSet(db, s"${name}_grams")
    require(grams.schema("g").dataType ==
        org.apache.spark.sql.types.BinaryType,
      s"gram index $db.${name}_grams stores ${grams.schema("g").dataType} " +
        "fingerprints (pre-binary-key layout); rebuild it with persistGramIndex")
    grams
  }

  /** In-memory form of [[spansAgainstStoredIndex]]: `corpusGrams` is any
    * frame exposing the fingerprint column `g`.
    */
  def spansAgainstGrams(
      newDocs: DataFrame, corpusGrams: DataFrame,
      idCol: String, textCol: String, k: Int = 8): DataFrame = {
    val wins = windowFingerprints(newDocs, idCol, textCol, k)
    spanIslands(
      wins.join(corpusGrams.select(col("g")), Seq("g"), "left_semi"),
      idCol, k)
  }

  /** The ACTION half of [[duplicateSpans]]: rewrite each document with
    * every duplicated k-token window removed EXCEPT at its corpus-
    * canonical first site (minimum (doc, position)) — the exact-substring
    * dedup apply step: later copies of a repeated passage are stripped
    * and a verbatim duplicate document collapses to empty. The canonical
    * occurrence survives unless a DIFFERENT duplicated window overlapping
    * it is itself non-canonical (token removal is the union over
    * non-canonical windows — the same overlap approximation every
    * window-hash exact-substring dedup makes).
    * Returns every input doc as (idCol, clean_text, n_removed).
    *
    * Scale shape: canonical-site election is a min(struct) aggregate on
    * the window fingerprint (map-side combine — no per-gram window
    * sort); removed positions explode k rows per non-canonical window;
    * the rebuild is one per-document aggregate whose state is bounded by
    * the document's own token count (the same bound as reading the doc).
    * No global order anywhere.
    */
  /** Shared (id, pos, fingerprint) window stream for the span family:
    * one codegen'd [[graft.functions.ShingleExpressions.wordShinglesAll]]
    * pass per row (position order, duplicates preserved — the same
    * kernel the LSH path uses, replacing the interpreted
    * transform/slice/array_join HOF chain that re-evaluates its captured
    * subtree per element), md5-fingerprinted AS 16-BYTE BINARY
    * (unhex(md5)) so the duplicate test shuffles a fixed-width key at
    * half the payload of the hex rendering, regardless of window text
    * width. The fingerprint never leaves the span family (outputs carry
    * spans, not grams), so the encoding is free to change.
    */
  private def windowFingerprints(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs
      // the id is the span family's identity/join key everywhere
      // downstream (site election, token-position joins, span output);
      // a null id row cannot be attributed to any document, and every
      // downstream join Catalyst plans infers an isnotnull on SOME
      // branch anyway. Stating both non-null constraints here keeps
      // each consumer's subtree canonically IDENTICAL, which is what
      // lets ReuseExchange evaluate the shingle+md5 pass once per
      // query instead of once per consumer (guide §2.4 — operations
      // keyed the same way share one exchange; the pre-r20
      // stripDuplicateSpans plan re-scanned and re-shingled the corpus
      // four times because inferred filters de-canonicalized its
      // subtrees).
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .transform(Parallelism.ensureWidth)
      .select(col("id"),
        posexplode(graft.functions.ShingleExpressions
          .wordShinglesAll(col("text"), k)).as(Seq("pos", "gram")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        unhex(md5(col("gram").cast("binary"))).as("g"))
      .filter(col("g").isNotNull)

  def stripDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("t"))
      .transform(Parallelism.ensureWidth)
    // One exchange keyed on the fingerprint feeds BOTH gram consumers
    // (guide §2.4): the per-gram aggregate and the join probe side
    // canonicalize to the same Exchange subtree, so ReuseExchange runs
    // the shingle+md5 pass once. The pre-r20 shape built `dup` (count),
    // `canon` (min site) and the semi-join as three separate subtrees —
    // the corpus was re-scanned and re-shingled FOUR times per query
    // (plan-verified: 4 parquet scans of `documents` at sf0.001).
    val wins = windowFingerprints(docs, idCol, textCol, k)
      .repartition(col("g"))
    // one aggregation per gram carries the duplicate test AND the
    // canonical-site election: min over all sites of a duplicated gram
    // equals min over that gram's (semi-joined) hit sites, so the
    // separate `canon` pass over the join output is the same value
    // computed one shuffle later
    val gstats = wins.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(struct(col("id"), col("pos"))).as("c0"))
      .filter(col("n") >= 2)
      .select(col("g"), col("c0"))
    // inner join ≡ the old semi-join+rejoin: only duplicated grams
    // survive, each annotated with its canonical first site
    val removedTok = wins.join(gstats, Seq("g"))
      .filter(struct(col("id"), col("pos")) =!= col("c0"))
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1).cast("long")))
          .as("tp"))
    // The rebuild never touches the token stream again (guide §2.3 /
    // §8 — decide with small rows, move heavy rows once): removed
    // positions merge into per-doc ISLANDS (dense_rank absorbs the
    // duplicate positions overlapping windows emit, so the old
    // pre-merge `.distinct()` exchange is gone too), each doc carries
    // its few islands as a sorted array, and the clean text is the
    // concatenation of the token-array slices BETWEEN islands — one
    // join against `toks`, no all-tokens posexplode, no anti-join, no
    // per-doc collect_list(struct)+array_sort of the whole document.
    // The pre-r20 shape shuffled every kept token through an
    // ObjectHashAggregate exchange (the corpus, again) to reassemble
    // strings whose order `toks` already held.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("tp"))
    val islands = removedTok
      .withColumn("grp", col("tp") - dense_rank().over(w))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("tp")).as("s"), max(col("tp")).as("e"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("rem"))
    // slice boundaries between islands: starts = [0, e₁+1, …, eₘ+1],
    // ends = [s₁-1, …, sₘ-1, n-1]; empty slices clamp to length 0
    val starts = concat(array(lit(0L)),
      transform(col("rem"), x => x.getField("e") + lit(1L)))
    val ends = concat(transform(col("rem"), x => x.getField("s") - lit(1L)),
      array(size(col("t")).cast("long") - lit(1L)))
    val kept = flatten(zip_with(starts, ends, (s, e) =>
      slice(col("t"), (s + lit(1L)).cast("int"),
        greatest(e - s + lit(1L), lit(0L)).cast("int"))))
    val removedCnt = aggregate(col("rem"), lit(0L),
      (acc, x) => acc + x.getField("e") - x.getField("s") + lit(1L))
    toks.join(islands, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(
          when(col("rem").isNull, array_join(col("t"), " "))
            .otherwise(array_join(kept, " ")),
          lit("")).as("clean_text"),
        // null text propagates null n_removed (size(null array) is
        // null), matching the old n_tok − n_kept arithmetic
        when(col("rem").isNull, size(col("t")).cast("long") - size(col("t")))
          .otherwise(size(col("t")).cast("long") * lit(0L) + removedCnt)
          .as("n_removed"))
  }

  /** The SemDeDup codebook-size rule: one cluster per `targetClusterSize`
    * corpus vectors, floored at 4 (below that the "within-cluster"
    * restriction stops meaning anything) and capped at the trainer's
    * sample limit (seeds are sample rows, so k can never exceed the
    * sample). With k ≈ n/target, the within-cluster candidate count
    * Σ|cluster|² ≈ n·target — LINEAR in the corpus, which is the whole
    * point of the knob: a pinned k leaves an n²/k term that re-emerges
    * as the corpus outgrows it (measured: 8× wall for 10× data at the
    * sf0.1→sf1 step with k=4). Same integer ceil as the SQL oracles'
    * `(COUNT(*) + target-1) // target` so both engines train the same
    * codebook.
    *
    * Past k = 2048 ([[routeThreshold]]) assignment no longer runs the
    * flat O(n·k·d) argmin: [[semanticPairs]] routes every row through a
    * ~√k coarse quantizer trained over the k centroids themselves and
    * argmins only within the routed cell
    * ([[SimilaritySearch.twoLevelNearestUdf]] — the ivfPqTopK shape
    * applied to codebook assignment), O(n·√k·d); the driver trainer
    * takes the same routed step ([[SimilaritySearch.trainCentroidsRouted]])
    * and the training sample scales to 2k rows so seeds exist for every
    * centroid. That removes the quadratic term the old
    * `maxClusters = 10000` cap used to hide (n > 1.25M vectors at the
    * defaults; measured beyond it in SEMDEDUP_SCALE_r12.json).
    *
    * The remaining `maxClusters = 200000` default is a MEMORY bound,
    * not a compute one: the codebook rides to executors task-broadcast
    * (200k × 64 dims × 8 B ≈ 100 MB) and the trainer collects a 2k-row
    * sample (≈200 MB at that point). Past it, the knob that scales is
    * `targetClusterSize` — SemDeDup's own cluster-size parameter — which
    * keeps the within-cluster pair term at n·target with a coarser
    * codebook; the linear regime now extends to n ≈ 25M vectors at the
    * defaults and arbitrarily far with target ∝ n/200000.
    */
  def autoClusters(n: Long, targetClusterSize: Int = 125,
      maxClusters: Int = 200000): Int =
    math.min(
      math.max(4L, (n + targetClusterSize - 1) / targetClusterSize),
      maxClusters.toLong).toInt

  /** Codebook size above which [[semanticPairs]] switches from the flat
    * per-row argmin to two-level routed assignment (and the trainer to
    * routed Lloyd steps). Below it behavior is bit-identical to the
    * pre-routing engine — the regime every DuckDB oracle runs in
    * (k = 2048 needs a 256k-vector corpus at the default target).
    */
  val routeThreshold: Int = 2048

  /** SemDeDup-style semantic near-dup pairs: cluster the corpus by a
    * kmeans codebook over its embeddings
    * ([[SimilaritySearch.trainCentroids]] — deterministic hash-ordered
    * sample seed), then verify cosine ONLY within a cluster. Same verify
    * math as [[cosinePairs]], but the candidate set shrinks from O(n²)
    * to Σ|cluster|², with the codebook size as the scale knob: k grows
    * with the corpus so clusters stay bounded, and the cross-cluster
    * misses are the method's documented recall trade. This is the dedup
    * regime text LSH cannot reach — paraphrase-level duplicates with
    * little lexical overlap. Output: (id_a, id_b, cluster, cos).
    *
    * `nClusters <= 0` (the default) sizes the codebook from the corpus
    * via [[autoClusters]] — k = ceil(n / targetClusterSize). The auto
    * path eagerly localCheckpoints `emb` first: the operator needs
    * three passes over it (count for k, the trainer's sample, the full
    * assignment), and embeddings are often DERIVED — e.g. a PNG
    * decode+featurize chain — where re-evaluation would triple the
    * dominant cost. The materialized frame is vectors only (n×dim
    * floats), orders smaller than the media it derives from. Pass an
    * explicit k to pin the geometry and keep the input fully lazy
    * (tests; corpora whose size the caller already knows).
    *
    * Assignment regime: k ≤ [[routeThreshold]] runs the flat argmin
    * (bit-identical to every oracle); larger codebooks route through a
    * √k coarse quantizer ([[SimilaritySearch.twoLevelNearestUdf]]) so
    * the corpus pass is O(n·√k·d) — see [[autoClusters]]. `routeCells`
    * > 0 FORCES two-level assignment with that many coarse cells at any
    * k (the dd_semantic_route oracle exercises the routed path at
    * oracle-reachable scale); `routeIters` is the coarse trainer's
    * Lloyd iteration count.
    */
  def semanticPairs(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 0, iters: Int = 3,
      threshold: Double = 0.4, targetClusterSize: Int = 125,
      routeCells: Int = 0, routeIters: Int = 2): DataFrame = {
    val (corpus, k, nRows) =
      if (nClusters > 0) (emb, nClusters, 0L)
      else {
        val mat = emb.localCheckpoint(true)
        val n = mat.count()
        (mat, autoClusters(n, targetClusterSize), n)
      }
    // seeds are sample rows, so the sample must cover k; 2k keeps a
    // training margin. Below k = 5000 this is exactly the oracle's
    // pinned 10000-row sample (max(10000, 2k) = 10000), and oracles can
    // never reach past it (k > 5000 needs n > 625k corpus vectors).
    // The auto path's paid-for count seeds the wide-sample prefilter.
    val sample = SimilaritySearch.sampleVectors(
      corpus, idCol, vecCol, math.max(10000, 2 * k), nRows)
    val centroids = SimilaritySearch.trainCentroidsRouted(
      sample, k, iters, routeThreshold)
    val assign =
      if (routeCells > 0)
        SimilaritySearch.twoLevelNearestUdf(centroids, routeCells, routeIters)
      else if (k > routeThreshold)
        // √k two-level router up to treeRouteThreshold, the assignment
        // tree past it (SEMDEDUP_SCALE_r20: the two-level corpus pass
        // was the lifecycle's remaining super-linear stage)
        SimilaritySearch.routedNearestUdf(centroids, routeIters)
      else SimilaritySearch.nearestUdf(centroids)
    val withC = corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .transform(Parallelism.ensureWidth)
      .select(col("id"), col("v"), assign(col("v")).as("c"),
        l2Norm(col("v")).as("nrm"))
    val a = withC.select(col("c"), col("id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("n_a"))
    val b = withC.select(col("c"), col("id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(b, Seq("c"))
      .filter(col("id_a") < col("id_b"))
      // rounded to 1e-6 like cosinePairs: threshold compare independent
      // of summation-order noise in the last float bits
      .withColumn("cos",
        round(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("c").as("cluster"), col("cos"))
  }

  /** [[semanticPairs]] with its geometry chosen by the placement
    * advisor's history instead of the static defaults (VERDICT r12
    * next #7): the corpus is counted once (after the same eager
    * localCheckpoint the auto path takes — the operator needs three
    * passes), the advisor folds that count into its `setRows` history
    * for `table` and recommends (targetClusterSize, k, routeCells) by
    * the documented scaling rule ([[graft.advisor.PlacementAdvisor
    * .recommendSemGeometry]]). Because the advisor remembers the
    * LARGEST observed size, a probe over a sampled slice of a corpus
    * it has seen whole still gets whole-corpus geometry — the history
    * advantage over the static path, which can only see the frame in
    * front of it. At default knobs the recommendation equals the
    * static sizing exactly (AdvisorSpec pins it; SEMDEDUP_SCALE
    * carries the measured parity row), so this is the same engine with
    * a memory, not a second regime.
    */
  def semanticPairsAdvised(
      emb: DataFrame, idCol: String, vecCol: String,
      advisor: graft.advisor.PlacementAdvisor, table: String,
      iters: Int = 3, threshold: Double = 0.4,
      routeIters: Int = 2): DataFrame = {
    val mat = emb.localCheckpoint(true)
    val g = advisor.recommendSemGeometry(table, mat.count())
    semanticPairs(mat, idCol, vecCol,
      nClusters = g.clusters, iters = iters, threshold = threshold,
      targetClusterSize = g.targetClusterSize,
      routeCells = g.routeCells, routeIters = routeIters)
  }

  /** Brute-force cosine near-dup pairs — the EXACT regime of a
    * two-regime design whose scale path is [[cosineLshPairs]] (lexical
    * family: [[minHashLshPairs]]; paraphrase family: [[semanticPairs]]).
    * The plan is a deliberate O(n²) cross join, correct and fine for
    * oracle fixtures and re-rank pools; `maxRows` is the loud size gate
    * (mirroring `BlockMatrix.inverse`'s `maxN`) that refuses to silently
    * attempt an n² plan on a corpus-sized input — at the default bound
    * the pair count already reaches ~5×10⁹. The gate's count runs over
    * an eagerly-materialized frame, so the (often derived) embedding
    * input is evaluated once, not once for the count and once for the
    * pair scan.
    */
  /** Persist a standing SEMANTIC index over a corpus: the SemDeDup
    * codebook (sized by [[autoClusters]] unless pinned) trained once,
    * plus the assigned corpus vectors partitioned one directory per
    * cluster — structurally [[SimilaritySearch.buildIvfIndex]] with the
    * semantic geometry, because the SemDeDup cluster IS an IVF cell:
    * the layout that makes the within-cluster verify a pruned join is
    * the same layout that makes ANN probes cheap. Build once; every
    * later [[streamSemanticAgainstIndex]] micro-batch reads only the
    * cells its arrivals assign to.
    */
  def persistSemanticIndex(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 0, iters: Int = 3,
      targetClusterSize: Int = 125): Unit = {
    val (mat, k, nRows) =
      if (nClusters > 0) (corpus, nClusters, 0L)
      else {
        // same eager materialization rationale as semanticPairs' auto
        // path: the build needs a count + the trainer sample + the full
        // assignment over a possibly-derived embedding frame
        val m = corpus.localCheckpoint(true)
        val n = m.count()
        (m, autoClusters(n, targetClusterSize), n)
      }
    // the count this path just paid seeds the trainer's wide-sample
    // prefilter (VERDICT r18 next #4: the r17 25M/200k lifecycle paid
    // ~2 extra full-corpus relax scans because the build's 400k-row
    // sample started from the 1e9 default fraction)
    SimilaritySearch.buildIvfIndex(mat.sparkSession, catalog, db, name,
      mat, nCentroids = k, iters = iters, idCol = idCol, vecCol = vecCol,
      knownRowCount = nRows)
  }

  /** Incrementally extend a persisted SEMANTIC index (lifecycle parity
    * with the ANN tiers — VERDICT r14 next #3, closing the build-once
    * asymmetry): arrivals are assigned under the index's FROZEN codebook
    * and appended into the cluster-partitioned standing vectors, so
    * every later [[streamSemanticAgainstIndex]] probe pairs against them
    * too — including the later micro-batches of a probe stream ALREADY
    * RUNNING when the append lands (the probe re-resolves the index per
    * batch; its LIVE-INDEX contract) — the index IS
    * [[SimilaritySearch.buildIvfIndex]]'s layout with
    * semantic geometry, so the append IS the IVF append (assignment
    * depends only on (vector, codebook); build(A)+append(B) ≡ one-shot
    * assignment of A∪B under A's codebook).
    *
    * Drift: the O(1) sidecar fraction ([[semanticDriftFraction]] —
    * appended rows over rows-at-build, no corpus scan) triggers
    * [[rebuildSemanticIndex]] when `rebuildIfDrifted` is set, the same
    * policy knob the compressed ANN appends carry. A long-running
    * semantic pipeline otherwise degrades silently as the corpus drifts
    * from the frozen codebook — the exact failure mode the ANN tiers'
    * rebuild exists to catch.
    */
  def appendToSemanticIndex(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      newEmb: DataFrame, idCol: String, vecCol: String,
      rebuildIfDrifted: Boolean = false, driftFraction: Double = 0.5,
      targetClusterSize: Int = 125, iters: Int = 3): Unit = {
    SimilaritySearch.appendToIvfIndex(newEmb.sparkSession, catalog, db, name,
      newEmb, idCol, vecCol)
    if (rebuildIfDrifted &&
        semanticDriftFraction(catalog, db, name) >= driftFraction)
      rebuildSemanticIndex(catalog, db, name, targetClusterSize, iters)
  }

  /** Streaming form of [[appendToSemanticIndex]]: every micro-batch of
    * arriving embeddings joins the standing semantic index (assigned
    * under the frozen codebook, appended into its cell's directory).
    * Batching-invariant — a vector's cell depends only on (vector,
    * codebook).
    */
  def streamAppendToSemanticIndex(
      stream: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, idCol: String, vecCol: String,
      rebuildIfDrifted: Boolean = false, driftFraction: Double = 0.5): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        appendToSemanticIndex(catalog, db, name, batch.toDF(), idCol, vecCol,
          rebuildIfDrifted, driftFraction)
        ()
      }
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Fraction of the semantic index appended since its codebook was
    * trained — two sidecar reads, O(1), the ANN tiers' drift dial
    * applied to the semantic geometry.
    */
  def semanticDriftFraction(
      catalog: graft.storage.SetCatalog, db: String, name: String): Double =
    SimilaritySearch.appendedDriftFraction(catalog, db, name)

  /** Retrain a persisted semantic index from its OWN standing vectors
    * and re-partition the corpus under the new cells — the rebuild half
    * of the lifecycle. Unlike the ANN rebuild (which keeps its codebook
    * size), the semantic codebook RE-SIZES by the SemDeDup rule: k =
    * [[autoClusters]](standing rows, targetClusterSize), read off the
    * sidecar — the whole point of the knob is that k tracks corpus
    * growth, and an append-heavy index whose k froze at build size is
    * exactly the degradation this exists to repair. Trainer and sample
    * are [[persistSemanticIndex]]'s own (md5-ordered deterministic
    * sample), so a rebuild equals a from-scratch build over the standing
    * corpus — the registry's lifecycle oracle pins that equality
    * end-to-end. Staged + swapped via
    * [[graft.storage.SetCatalog.swapSetGroup]]; the drift fraction
    * resets to 0.
    */
  def rebuildSemanticIndex(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      targetClusterSize: Int = 125, iters: Int = 3): Unit = {
    val rows = catalog.meta(db, s"${name}_vectors").map(_.rows).getOrElse(
      throw new IllegalArgumentException(
        s"rebuildSemanticIndex: no semantic index $db.$name"))
    val spark = catalog.scanSet(db, s"${name}_vectors").sparkSession
    SimilaritySearch.rebuildIvfIndex(spark, catalog, db, name, iters,
      nCentroids0 = autoClusters(rows, targetClusterSize))
  }

  /** One micro-batch of [[streamSemanticAgainstIndex]]: assign each
    * arrival under the STANDING codebook (the same assignment kernel
    * the corpus was assigned with — flat below the routing threshold,
    * √k-routed above it), then verify cosine against the standing
    * vectors of the arrival's cell only. The arrival side is
    * broadcast, so the standing set is read with dynamic partition
    * pruning — a batch touching b distinct cells costs b directories of
    * IO however large the corpus grows.
    */
  private[graft] def semanticBatchPairs(
      batch: DataFrame, centroids: Array[Array[Double]],
      vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, routeThreshold: Option[Int] = None): DataFrame = {
    // the index lifecycle's shared assignment rule (flat below the
    // routing threshold, √k-routed above): arrivals MUST assign exactly
    // as the standing vectors were, or probes read the wrong cells —
    // `routeThreshold` carries the index's PERSISTED threshold when the
    // caller probes a persisted index (session conf otherwise)
    val assign = routeThreshold
      .map(SimilaritySearch.indexAssignUdfFor(_, centroids))
      .getOrElse(SimilaritySearch.indexAssignUdf(batch.sparkSession, centroids))
    val bucketType = vectors.schema("bucket").dataType
    // eager: the arrival frame is batch-sized and used twice below (the
    // touched-cell collect and the broadcast join) — without this the
    // assign UDF would run twice per batch
    val arr = SimilaritySearch.withCellGroup(vectors,
      batch.select(col(idCol).as("id_b"), col(vecCol).as("b_vec"),
          l2Norm(col(vecCol)).as("b_nrm"))
        .withColumn("bucket", assign(col("b_vec")).cast(bucketType)))
      .localCheckpoint(eager = true)
    // STATIC cell pruning, not dynamic: a foreachBatch micro-batch is a
    // LocalRelation/LogicalRDD, which gives the DPP insertion heuristics
    // nothing to estimate — the per-batch plan carried only an
    // isnotnull partition filter (PlanSpec caught it), i.e. corpus IO
    // per batch at 100 TB. The probed cells are collected off the
    // batch-sized arrival frame and pushed as LITERAL filters instead:
    // the file listing prunes deterministically under ANY batch plan
    // shape, a probe of b cells reads ≤ b directories.
    val pruned = SimilaritySearch.pruneToTouchedCells(vectors, arr)
    pruned.join(broadcast(arr), SimilaritySearch.cellJoinKeys(vectors))
      .withColumn("cos",
        round(dot(col("n_vec"), col("b_vec")) / (col("n_nrm") * col("b_nrm")), 6))
      .filter(col("cos") >= threshold)
      .select(col("neighbor_id").as("id_a"), col("id_b"),
        col("bucket").cast("long").as("cluster"), col("cos"))
  }

  /** Streaming SEMANTIC dedup — the standing-index form of
    * [[semanticPairs]], completing streaming parity for the last dedup
    * family without one (exact/minhash/span/frame/audio all have `st_*`
    * forms): arrivals are assigned per micro-batch under the standing
    * codebook persisted by [[persistSemanticIndex]] and verified against
    * the standing corpus vectors WITHIN their assigned cell only —
    * paraphrase-level near-dup detection at ingest, the regime text LSH
    * cannot reach. Emits (id_a = corpus id, id_b = arrival id, cluster,
    * cos ≥ threshold) — the cross-corpus contract of
    * [[streamNearDupPairs]]; arrival-vs-arrival pairs are the batch
    * operator's job at the next re-index.
    *
    * Batching-invariant by construction: an arrival's cell depends only
    * on (vector, codebook) — the [[SimilaritySearch.appendToIvfIndex]]
    * argument — and its pairs only on (arrival, standing cell), so any
    * batching of the same arrivals unions to the one-shot batch probe.
    *
    * Scale shape: per batch, one broadcast of the arrivals and a
    * partition-pruned read of only their cells; nothing re-shuffles the
    * corpus, no state store at all (the standing index IS the state).
    *
    * LIVE-INDEX contract (VERDICT r15 next #1): the standing index is
    * re-resolved INSIDE the batch closure — centroids re-collected
    * (O(k) rows) and the vector set re-planned (one file listing) per
    * micro-batch — NOT captured once at stream start. Two consequences
    * a standing pipeline needs: (a) an [[appendToSemanticIndex]]
    * landing mid-stream is visible to every LATER micro-batch of a
    * live probe stream (a frozen plan would pin the file listing of
    * stream start for the stream's whole life); (b) a
    * [[rebuildSemanticIndex]] swap mid-stream — which DELETES the old
    * generation's directories — is survived: the next batch probes the
    * new generation instead of failing on the renamed-away files.
    * Within one batch, the centroid collect and the vector scan read
    * one generation because maintenance runs between batches of the
    * owning pipeline (the single-writer contract every lifecycle op
    * documents); the crash-atomic swap marker covers the remaining
    * two-rename window.
    */
  def streamSemanticAgainstIndex(
      stream: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, idCol: String, vecCol: String,
      threshold: Double = 0.4,
      sink: Option[(graft.storage.SetCatalog, String, String)] = None): DataFrame =
    streamProbe(stream,
      semanticProbeFn(catalog, db, name, idCol, vecCol, threshold), sink)

  /** Per-batch probe closure of [[streamSemanticAgainstIndex]] — the
    * re-resolution happens HERE, once per micro-batch. Package-visible
    * so the mid-stream lifecycle specs can drive it through
    * [[startProbe]] and interleave appends/rebuilds between batches.
    */
  private[graft] def semanticProbeFn(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      idCol: String, vecCol: String, threshold: Double): DataFrame => DataFrame =
    semanticProbeFnCounted(catalog, db, name, idCol, vecCol, threshold)._1

  /** [[semanticProbeFn]] plus its codebook-collect counter — the
    * observable surface the cache spec pins (collect count is per
    * closure, so concurrent suites cannot race it).
    */
  private[graft] def semanticProbeFnCounted(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      idCol: String, vecCol: String, threshold: Double)
      : (DataFrame => DataFrame, () => Int) = {
    // Generation-cached codebook: the centroid collect is O(k·d) driver
    // bytes (~100 MB at a 200k-cell semantic codebook) — paid per
    // micro-batch it would dwarf small batches, and APPENDS never
    // change the codebook. The centroids sidecar stamp is the
    // generation witness (every create/swap/tag rewrite touches it), so
    // the collect re-runs exactly when a rebuild swapped a new
    // generation in; the VECTORS plan still re-resolves every batch —
    // that is where appends land.
    var cached: Option[(Long, Array[Array[Double]], Int)] = None
    var loadCount = 0
    val fn = (batch: DataFrame) => {
      val stamp = catalog.metaStamp(db, s"${name}_centroids")
      val (centroids, routeT) = cached match {
        case Some((s0, c, t0)) if s0 == stamp && stamp != 0L => (c, t0)
        case _ =>
          val ct = SimilaritySearch
            .loadCentroidsWithThreshold(batch.sparkSession, catalog, db, name)
          cached = Some((stamp, ct._1, ct._2))
          loadCount += 1
          ct
      }
      val vectors = catalog.scanSet(db, s"${name}_vectors")
      semanticBatchPairs(batch, centroids, vectors, idCol, vecCol, threshold,
        routeThreshold = Some(routeT))
    }
    (fn, () => loadCount)
  }

  def cosinePairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxRows: Long = 100000L): DataFrame = {
    val mat = emb.localCheckpoint(true)
    val n = mat.count()
    require(n <= maxRows,
      s"cosinePairs: $n rows exceeds the brute-force bound $maxRows — " +
        "the all-pairs plan is O(n²) by design; use cosineLshPairs " +
        "(high-threshold LSH) or semanticPairs (SemDeDup clustering) " +
        "for corpus-scale near-dup, or raise maxRows deliberately")
    // precompute each vector's norm once — O(n·d) instead of O(n²·d) norm
    // work inside the pair loop
    val withNorm = mat.select(col(idCol).as("id"), col(vecCol).as("v"),
      l2Norm(col(vecCol)).as("nrm"))
      // small single-file inputs would otherwise give the O(n²) pair loop
      // single-task parallelism; no-op when the input is already wide
      .transform(Parallelism.ensureWidth)
    val a = withNorm.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = withNorm.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      // rounded to 1e-6: keeps the threshold compare independent of
      // summation-order noise in the last float bits
      .withColumn("cos", round(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
