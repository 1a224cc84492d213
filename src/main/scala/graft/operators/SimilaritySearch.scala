package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  * Brute-force cosine top-k is the exact baseline (O(q·n), fine when the
  * query set is small and broadcast); IVF is the scale path: a coarse
  * quantizer (k-means on a driver-side sample) buckets vectors, queries
  * probe only the nearest `nprobe` buckets — turning all-pairs into a
  * bucketed join that shuffles each partition once.
  */
object SimilaritySearch {

  /** Exact top-k neighbors for each query vector, by cosine. The query set
    * is broadcast (small side); ranks are made deterministic by rounding
    * the score to 1e-6 and tie-breaking on neighbor id.
    */
  def bruteForceTopK(
      emb: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms precomputed per side — O((q+n)·d) instead of O(q·n·d) norm work
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_nrm"))
    val n = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
      l2Norm(col(vecCol)).as("n_nrm"))
      // spread the scan side so the broadcast probe runs wide (no-op when
      // the input is already wide)
      .transform(Parallelism.ensureWidth)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    n.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Train a coarse quantizer: k-means over a collected sample (the
    * standard IVF recipe — the codebook is tiny and training data is a
    * bounded sample, so driver-side iteration is the scalable design,
    * mirroring how the reference runs iterative ML as client-side loops,
    * e.g. reference: src/tests/source/TestKMeans.cc).
    *
    * The sample is the `sampleLimit` rows with the SMALLEST md5(id) —
    * the same deterministic-hash kernel as [[Sampling.stratified]], so
    * it is uniform over the corpus (an id-prefix sample is whatever the
    * id assignment correlates with: crawl order, shard, tenant) yet
    * rerun-stable and oracle-reproducible. The plan is a
    * TakeOrderedAndProject (per-partition k-bounded heap + driver merge
    * of k-row slices — never a global sort), so the cost at 100 TB is
    * one scan of (id, vector), and the heap holds 10k rows.
    */
  /** The shared deterministic training sample: the `sampleLimit` rows
    * with the smallest (md5(id), id), as raw double vectors — collected
    * ONCE and reusable by both the coarse quantizer and the PQ
    * sub-codebook trainers (an IVF-PQ build needs both; collecting the
    * identical sample twice doubles the most expensive training step, a
    * full corpus scan at scale).
    *
    * The md5 key is MATERIALIZED as a column before the orderBy:
    * `orderBy(md5(...)).limit(n)` plans as TakeOrderedAndProject, whose
    * bounded-heap comparator re-evaluates the ordering EXPRESSIONS on
    * every row-pair comparison (no radix-prefix shortcut like SortExec)
    * — a digest per comparison turns the one-scan O(n·log k) sample
    * into ~n·log k md5 calls (measured: the 10M-row / 160k-sample
    * collect sat >15 min where the materialized form takes seconds).
    * Projecting the key first makes the comparator a plain attribute
    * compare; the (key, id) order — hence the selected sample, the
    * centroids, and every oracle downstream — is byte-identical.
    *
    * Large samples take the PREFILTERED path: TakeOrdered ships every
    * partition's top-`sampleLimit` to the driver, so a wide sample on a
    * wide scan is a partitions×sampleLimit driver merge — the 25M-row /
    * 400k-sample collect breaches the default 1 GiB
    * spark.driver.maxResultSize outright, and at cluster partition
    * counts it would breach ANY driver bound. md5 keys are uniform on
    * the hex keyspace, so `key < T` with T at 4× the 1e9-row
    * expectation keeps a small certified superset: if the filtered
    * count covers `sampleLimit`, the global smallest (key, id) rows all
    * lie inside it (every excluded row keys ABOVE every included one)
    * and the exact top-k over the small set IS the corpus top-k —
    * verified by count, not assumed, with a 16× threshold relax loop
    * (terminates at the unfiltered exact path) covering any corpus
    * size. Small samples — every oracle-scale trainer, the 10k default
    * — stay on the direct one-scan plan unchanged.
    */
  private[graft] def sampleVectors(
      emb: DataFrame, idCol: String, vecCol: String,
      sampleLimit: Int, knownRowCount: Long = 0L): Array[Array[Double]] = {
    // a name provably fresh against the caller's schema: withColumn
    // would silently REPLACE a pre-existing column of the same name
    // (ADVICE r17) — only vecCol is selected out today, but the private
    // API shouldn't carry the shadowing hazard
    val key = Iterator.from(0)
      .map(i => if (i == 0) "__sample_key" else s"__sample_key$i")
      .find(n => !emb.columns.contains(n)).get
    val keyed = emb
      .withColumn(key, md5(col(idCol).cast("string").cast("binary")))
    def collectTop(df: DataFrame): Array[Array[Double]] =
      df.orderBy(col(key), col(idCol))
        .limit(sampleLimit)
        .select(col(vecCol)).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    if (sampleLimit <= directSampleLimit) collectTop(keyed)
    else {
      // Seed the prefilter fraction from the corpus rowcount when the
      // caller already has one (sidecar rows, a paid-for count) — each
      // relax step that under-covers costs a full corpus scan + persist
      // + count (ADVICE r17: the hardcoded 1e9 seed made a 10M-row /
      // 160k-sample run pay 3 scans). Clamped to 0.4 so at least one
      // CERTIFIED prefilter attempt always runs before the unfiltered
      // fallback — at sampleLimit ≥ ~1.25e8 the raw seed is ≥ 0.5 and
      // the loop would silently skip straight to the partitions×limit
      // driver merge the prefilter exists to avoid.
      val n = if (knownRowCount > 0) knownRowCount.toDouble else 1e9
      var frac = math.min(0.4, 4.0 * sampleLimit / n)
      var out: Option[Array[Array[Double]]] = None
      while (out.isEmpty && frac < 0.5) {
        samplePrefilterAttempts.incrementAndGet()
        // 16 hex digits of the 128-bit keyspace: floor(frac·2⁶⁴) as a
        // zero-padded hex literal compares lexicographically against
        // the 32-char key exactly as the numeric prefix would
        val t = f"${(frac * math.pow(2.0, 64)).toLong}%016x"
        val filtered = keyed.filter(col(key) < t)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (filtered.count() >= sampleLimit) {
            samplePrefilterHits.incrementAndGet()
            out = Some(collectTop(filtered))
          } else frac *= 16
        } finally filtered.unpersist()
      }
      if (out.isEmpty)
        // loud: at wide limits the fallback is the exact driver-merge
        // shape the prefilter exists to avoid (ADVICE r17)
        System.err.println(
          s"[graft] sampleVectors: certified prefilter exhausted at " +
            s"sampleLimit=$sampleLimit — falling back to the direct " +
            "TakeOrdered plan (partitions×limit driver merge)")
      out.getOrElse(collectTop(keyed))
    }
  }

  /** Test hooks (ADVICE r17): IvfIndexSpec's wide-sample equivalence
    * cases assert the PREFILTERED branch actually produced the result —
    * byte-equality alone would also pass via the silent unfiltered
    * fallback, hiding a certification regression (e.g. a threshold
    * formatting bug failing every count).
    */
  private[graft] val samplePrefilterAttempts =
    new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] val samplePrefilterHits =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Above this, [[sampleVectors]] prefilters by key prefix before the
    * top-k: the direct plan's driver merge is partitions×limit rows.
    * Package-visible so regime-aware callers (SemScale's prefilter
    * certification gate — ADVICE r19: requiring exactly one attempt
    * crashed every run whose sample fit the DIRECT path, which takes
    * zero attempts by design) can compute the expected attempt count
    * instead of hardcoding the wide regime's.
    */
  private[graft] val directSampleLimit = 65536

  def trainCentroids(
      emb: DataFrame, nCentroids: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      sampleLimit: Int = 10000): Array[Array[Double]] =
    trainCentroidsFromSample(
      sampleVectors(emb, idCol, vecCol, sampleLimit), nCentroids, iters)

  private[graft] def trainCentroidsFromSample(
      sample: Array[Array[Double]], nCentroids: Int,
      iters: Int): Array[Array[Double]] = {
    var centroids = sample.take(nCentroids).map(_.clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(nCentroids)(new Array[Double](centroids(0).length))
      val counts = new Array[Long](nCentroids)
      sample.foreach { v =>
        val c = nearest(centroids, v)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids
  }

  /** Single-pass nearest-centroid assignment as a scalar UDF: the codebook
    * rides in the closure (tiny — task-serialized like a broadcast), one
    * tight JVM loop per row. This replaces the earlier nested
    * transform/aggregate/zip_with form, which Catalyst evaluates
    * INTERPRETED and which computed the 16×64 distance array twice per row
    * (once for array_min, once for array_position). Same IEEE op order as
    * the HOF form (sequential diff² accumulation from 0.0, first-min
    * tiebreak), so assignment parity with the SQL oracles is preserved.
    */
  def nearestUdf(centroids: Array[Array[Double]]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((v: Seq[Float]) => {
      val arr = new Array[Double](v.length)
      var i = 0
      while (i < arr.length) { arr(i) = v(i).toDouble; i += 1 }
      nearest(centroids, arr).toLong
    })

  /** The `nprobe` nearest centroid ids for a query vector, ascending by
    * (distance, bucket) — one distance pass, same ordering as the SQL
    * oracle's array_sort over (d, b) structs.
    */
  def probeUdf(centroids: Array[Array[Double]], nprobe: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((v: Seq[Float]) => {
      val arr = new Array[Double](v.length)
      var i = 0
      while (i < arr.length) { arr(i) = v(i).toDouble; i += 1 }
      val dists = centroids.map { c =>
        var d = 0.0
        var j = 0
        while (j < arr.length) { val diff = c(j) - arr(j); d += diff * diff; j += 1 }
        d
      }
      dists.zipWithIndex.sortBy { case (d, b) => (d, b) }.take(nprobe).map(_._2.toLong).toSeq
    })

  /** Coarse router over a FINE codebook: train a small coarse quantizer
    * over the k fine centroids THEMSELVES (the [[ivfPqTopK]] cell shape
    * applied to codebook assignment — the fix named by
    * [[graft.operators.Dedup.autoClusters]]'s scaladoc since round 11),
    * then group each fine centroid under its nearest coarse cell. Empty
    * cells are dropped, so every routable cell has at least one fine
    * centroid to argmin over. Everything here is driver-side over the
    * codebook only — O(k·nCoarse·d), never touching the corpus.
    * Returns (non-empty coarse centroids ascending by original seed
    * index, member fine-centroid GLOBAL indices per cell, ascending).
    */
  private[graft] def coarseRouter(
      centroids: Array[Array[Double]], nCoarse: Int,
      iters: Int): (Array[Array[Double]], Array[Array[Int]]) = {
    val coarse = trainCentroidsFromSample(centroids, nCoarse, iters)
    val members =
      Array.fill(coarse.length)(scala.collection.mutable.ArrayBuffer.empty[Int])
    var c = 0
    while (c < centroids.length) {
      members(nearest(coarse, centroids(c))) += c
      c += 1
    }
    val nonEmpty = members.indices.filter(members(_).nonEmpty).toArray
    (nonEmpty.map(coarse), nonEmpty.map(members(_).toArray))
  }

  /** ceil(√k) — the standard two-level cell count: k/√k fine centroids
    * per cell in expectation, so a routed argmin costs O(2·√k·d) per row
    * instead of the flat O(k·d).
    */
  private[graft] def sqrtCells(k: Int): Int =
    math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)

  /** Two-level nearest-centroid assignment: route each row to its
    * nearest (non-empty) coarse cell, then argmin over ONLY that cell's
    * fine centroids — O(√k·d) per row. Returns the GLOBAL fine-centroid
    * index, so downstream grouping is identical in shape to
    * [[nearestUdf]]. Approximate by design: the true nearest fine
    * centroid can live in a neighboring coarse cell (the IVF recall
    * trade); ties break to the smallest global index on both levels,
    * exactly like the flat argmin, so the routed assignment is
    * deterministic and oracle-reproducible.
    */
  def twoLevelNearestUdf(
      centroids: Array[Array[Double]], nCoarse: Int,
      routeIters: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val (coarse, members) = coarseRouter(centroids, nCoarse, routeIters)
    udf((v: Seq[Float]) => {
      val arr = new Array[Double](v.length)
      var i = 0
      while (i < arr.length) { arr(i) = v(i).toDouble; i += 1 }
      val mem = members(nearest(coarse, arr))
      // argmin over the cell's members in ascending GLOBAL index order —
      // first-strict-min, so ties resolve like the flat kernel's
      var best = mem(0)
      var bestD = Double.MaxValue
      var m = 0
      while (m < mem.length) {
        val c = centroids(mem(m))
        var d = 0.0
        var j = 0
        while (j < arr.length) { val diff = c(j) - arr(j); d += diff * diff; j += 1 }
        if (d < bestD) { bestD = d; best = mem(m) }
        m += 1
      }
      best.toLong
    })
  }

  /** Node of the hierarchical assignment router ([[treeNearestUdf]]):
    * either an internal b-way split (coarse centers + matching
    * children) or a leaf holding fine-centroid GLOBAL indices,
    * ascending. Plain serializable case classes — the tree rides in
    * the UDF closure exactly like the flat codebook does, adding only
    * ~k/(b−1) interior centers to it.
    */
  private[graft] sealed trait RouteNode extends Serializable
  private[graft] final case class RouteBranch(
      centers: Array[Array[Double]],
      children: Array[RouteNode]) extends RouteNode
  private[graft] final case class RouteLeaf(members: Array[Int])
      extends RouteNode

  /** Branch factor of the assignment tree: ⌈k^(1/4)⌉, so a descent does
    * ~3 levels of b-way argmin plus one ≤b-member leaf scan — ~4·k^(1/4)
    * distance evaluations per row where the two-level router does
    * 2·√k (450 → ~85 at k = 200k) and the flat argmin does k. With
    * k ∝ n (SemDeDup's n/125 sizing) the corpus assignment pass drops
    * from O(n^1.5) to O(n^1.25).
    */
  private[graft] def treeRouteBranch(k: Int): Int =
    math.max(2, math.ceil(math.pow(k.toDouble, 0.25)).toInt)

  /** Recursive b-way split of a fine-centroid index set: train a b-way
    * coarse quantizer over the member centroids themselves (the
    * [[coarseRouter]] step applied per node), partition members by
    * nearest coarse center, recurse. Members keep ascending global
    * order through the stable partition, so leaf argmins tie-break to
    * the smallest global index exactly like the flat kernel — the tree
    * is a pure, deterministic function of the codebook. A node whose
    * members collapse into one coarse cell (duplicate centroids) stops
    * splitting and becomes a leaf.
    */
  private[graft] def buildRouteTree(
      centroids: Array[Array[Double]], idxs: Array[Int], branch: Int,
      iters: Int): RouteNode = {
    if (idxs.length <= branch) return RouteLeaf(idxs)
    val rows = idxs.map(centroids(_))
    val coarse = trainCentroidsFromSample(rows, branch, iters)
    val members =
      Array.fill(coarse.length)(scala.collection.mutable.ArrayBuffer.empty[Int])
    var i = 0
    while (i < idxs.length) {
      members(nearest(coarse, rows(i))) += idxs(i)
      i += 1
    }
    val nonEmpty = members.indices.filter(members(_).nonEmpty).toArray
    if (nonEmpty.length <= 1) RouteLeaf(idxs)
    else RouteBranch(
      nonEmpty.map(coarse),
      nonEmpty.map(c =>
        buildRouteTree(centroids, members(c).toArray, branch, iters)))
  }

  /** Tree-routed nearest-centroid assignment for HUGE codebooks
    * (k > [[treeRouteThreshold]] — the semantic-index regime, k ≈ n/125):
    * descend the [[buildRouteTree]] hierarchy with a b-way argmin per
    * level, then argmin over only the reached leaf's fine centroids —
    * ~4·k^(1/4) distance evaluations per row. Same contract as
    * [[twoLevelNearestUdf]]: returns the GLOBAL fine-centroid index,
    * approximate by design (the IVF recall trade, one level deeper),
    * deterministic under any schedule, ties to the smallest global
    * index. SEMDEDUP_SCALE_r20 measured the two-level corpus assignment
    * as the lifecycle's asymptotic ceiling (assign_exp 1.69 ≈ the
    * O(n·√k·d) design shape); this is the tree the trainer already
    * climbs ([[trainCentroidsTree]]) applied to the cluster side.
    */
  def treeNearestUdf(
      centroids: Array[Array[Double]],
      routeIters: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val tree = buildRouteTree(centroids, centroids.indices.toArray,
      treeRouteBranch(centroids.length), routeIters)
    udf((v: Seq[Float]) => {
      val arr = new Array[Double](v.length)
      var i = 0
      while (i < arr.length) { arr(i) = v(i).toDouble; i += 1 }
      var node = tree
      while (node.isInstanceOf[RouteBranch]) {
        val b = node.asInstanceOf[RouteBranch]
        node = b.children(nearest(b.centers, arr))
      }
      val mem = node.asInstanceOf[RouteLeaf].members
      var best = mem(0)
      var bestD = Double.MaxValue
      var m = 0
      while (m < mem.length) {
        val c = centroids(mem(m))
        var d = 0.0
        var j = 0
        while (j < arr.length) { val diff = c(j) - arr(j); d += diff * diff; j += 1 }
        if (d < bestD) { bestD = d; best = mem(m) }
        m += 1
      }
      best.toLong
    })
  }

  /** Codebook size above which routed assignment dispatches from the
    * two-level router to the [[treeNearestUdf]] hierarchy — the SAME
    * boundary as the trainer's [[treeTrainThreshold]], so the two
    * lifecycle dimensions (train, assign) switch regimes together.
    * Every oracle-scale (k ≤ 2048, flat) and spec-pinned mid-size
    * routed path (k ≤ 16384, two-level) is bit-identical to before;
    * only the multi-million-row semantic builds cross it.
    */
  private[graft] def treeRouteThreshold: Int = treeTrainThreshold

  /** The routed (above-threshold) assignment kernel: two-level √k
    * router up to [[treeRouteThreshold]], the assignment tree past it.
    * Pure function of the codebook, so build, append, rebuild and
    * probe of one index always agree.
    */
  private[graft] def routedNearestUdf(
      centroids: Array[Array[Double]],
      routeIters: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    if (centroids.length > treeRouteThreshold)
      treeNearestUdf(centroids, routeIters)
    else
      twoLevelNearestUdf(centroids, sqrtCells(centroids.length), routeIters)

  /** Routed-cell count for a PERSISTED index's per-row assignment: 0
    * (flat argmin) at or below the routing threshold, ceil(√k) above it
    * — [[graft.operators.Dedup.semanticPairs]]' rule applied to the
    * index lifecycle, because a semantic index's codebook grows with
    * the corpus (k ≈ n/125 — 200k cells at 25M vectors) and a flat
    * O(n·k·d) assignment pass in build/append/probe would re-acquire
    * exactly the quadratic term routing removed from the pair operator.
    * The rule is a PURE FUNCTION of the persisted centroid count (plus
    * the session threshold), so build, append, rebuild and probe all
    * derive the identical assignment with nothing extra to persist or
    * crash-protect. `spark.graft.ann.routeThreshold` exists so tests
    * can exercise the routed lifecycle at fixture scale — it is an
    * engine constant in production (an index must be probed under the
    * threshold it was built with; the default never changes mid-run).
    */
  private[graft] def autoRouteCells(
      spark: SparkSession, k: Int): Int =
    routedCellsFor(sessionRouteThreshold(spark), k)

  /** The session-conf read of the routing threshold — the BUILD-time
    * authority. Probe/append stages of a PERSISTED index must NOT read
    * this: they derive the threshold from the index itself
    * ([[persistedRouteThreshold]]), because an index built in a session
    * with a non-default threshold and probed in one without it would
    * otherwise assign arrivals to different cells than the standing
    * vectors — identity pairs silently lost (ADVICE r15).
    */
  private[graft] def sessionRouteThreshold(spark: SparkSession): Int =
    spark.conf.get("spark.graft.ann.routeThreshold",
      graft.operators.Dedup.routeThreshold.toString).toInt

  /** The routing rule as a pure function of (threshold, k). */
  private[graft] def routedCellsFor(threshold: Int, k: Int): Int =
    if (k > threshold) sqrtCells(k) else 0

  /** The per-row cell-assignment kernel every persisted-index lifecycle
    * stage shares: flat argmin below the routing threshold (bit-
    * identical to every oracle), two-level routed above it. This
    * overload reads the SESSION threshold — for the build/rebuild
    * paths, which persist their decision; lifecycle stages of an
    * existing index use [[indexAssignUdfFor]] with the index's OWN
    * persisted threshold.
    */
  private[graft] def indexAssignUdf(
      spark: SparkSession, centroids: Array[Array[Double]]): org.apache.spark.sql.expressions.UserDefinedFunction =
    indexAssignUdfFor(sessionRouteThreshold(spark), centroids)

  private[graft] def indexAssignUdfFor(
      threshold: Int, centroids: Array[Array[Double]]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val cells = routedCellsFor(threshold, centroids.length)
    if (cells > 0) routedNearestUdf(centroids, routeIters = 2)
    else nearestUdf(centroids)
  }

  /** The routing regime's self-describing witness, mirroring the
    * grouped layout's `cell_group_N` pattern: the centroids set carries
    * a marker COLUMN whose name encodes the threshold the index was
    * built under (`route_threshold_2048`) — atomic with the codebook by
    * construction (the swap that replaces the codebook replaces its
    * threshold), nothing extra to crash-protect, and a session-conf
    * drift after build cannot desynchronize assignment between the
    * standing vectors and later arrivals/probes.
    */
  private[graft] def withRouteThreshold(
      spark: SparkSession, centroidsDf: DataFrame): DataFrame =
    centroidsDf.withColumn(
      s"route_threshold_${sessionRouteThreshold(spark)}", lit(true))

  /** Parse the persisted threshold back out of a centroids frame's
    * schema; None for pre-marker (legacy) indexes, which fall back to
    * the session conf — their build sessions never set it either.
    */
  private[graft] def persistedRouteThreshold(
      centroidsDf: DataFrame): Option[Int] =
    centroidsDf.columns.find(_.startsWith("route_threshold_"))
      .map(_.stripPrefix("route_threshold_").toInt)

  /** Collect a persisted codebook (bucket-ordered) together with the
    * routing threshold governing ITS assignments: the persisted marker
    * when present, else the session conf (legacy indexes). Every
    * lifecycle stage of an existing index loads centroids through this
    * one path, so the assignment regime cannot fork between stages.
    */
  private[graft] def loadCentroidsWithThreshold(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String): (Array[Array[Double]], Int) = {
    val df = catalog.scanSet(db, s"${name}_centroids")
    val cents = df.orderBy(col("bucket")).select(col("centroid"))
      .collect().map(_.getSeq[Double](0).toArray)
    (cents,
      persistedRouteThreshold(df).getOrElse(sessionRouteThreshold(spark)))
  }

  /** Directory-fanout bound for the cell-partitioned vector set: one
    * directory PER CELL is the right layout at ANN-scale k (16-256
    * cells — pruning reads exactly the probed cells' directories), but a
    * semantic-scale codebook (k ≈ n/125 — 200k cells at 25M vectors)
    * would mean 200k directories of ~125 rows each: tiny files and a
    * listing/namenode bill that grows with k, the classic
    * over-partitioning failure. Above this bound the build partitions by
    * a CELL GROUP (bucket mod nGroups) instead — a probe of b cells
    * touches ≤ b group directories (same pruning bound), each holding
    * ~k/nGroups cells' rows, and the true cell id stays a normal column
    * for the in-group join. Conf for tests; an engine constant in
    * production.
    */
  private[graft] def maxCellDirs(spark: SparkSession): Int =
    spark.conf.get("spark.graft.ann.maxCellDirs", "1024").toInt

  /** The group column NAME carries its modulus (`cell_group_1024`), so
    * the layout is entirely self-describing: append and probe parse the
    * modulus back out of the schema they just read — atomic with the
    * data by construction, nothing extra to persist or crash-protect,
    * and a conf change after build cannot desynchronize them.
    */
  private[graft] def cellGroupColOf(vectors: DataFrame): Option[(String, Int)] =
    vectors.columns.find(_.startsWith("cell_group_"))
      .map(c => (c, c.stripPrefix("cell_group_").toInt))

  /** (partitionColumn, frame-with-layout-columns) for a freshly assigned
    * vector frame: per-cell directories at ANN-scale k, grouped
    * directories above [[maxCellDirs]].
    */
  private def cellLayout(
      spark: SparkSession, assigned: DataFrame, k: Int): (String, DataFrame) = {
    val nGroups = maxCellDirs(spark)
    if (k <= nGroups) ("bucket", assigned)
    else {
      val c = s"cell_group_$nGroups"
      // cluster by group before the partitioned write: an unclustered
      // partitionBy write emits one file per (task × group) — the
      // bucketed-write explosion createBucketedSet documents, ~32k tiny
      // files at 1024 groups × 32 tasks. Clustered, each group's rows
      // land in one shuffle partition → ~one file per directory.
      (c, assigned.withColumn(c, pmod(col("bucket"), lit(nGroups.toLong)))
        .repartition(col(c)))
    }
  }

  /** Add the standing layout's group column to a probe/append side whose
    * `bucket` is already computed, casting to the partition column's
    * Hive-inferred type. No-op for per-cell layouts.
    */
  private[graft] def withCellGroup(
      standing: DataFrame, df: DataFrame): DataFrame =
    cellGroupColOf(standing) match {
      case None => df
      case Some((c, n)) =>
        df.withColumn(c,
          pmod(col("bucket").cast("long"), lit(n.toLong))
            .cast(standing.schema(c).dataType))
    }

  /** Join keys for a probe against the standing vector set: the group
    * column first when the layout is grouped (directory pruning), then
    * the cell id (in-group row pruning).
    */
  private[graft] def cellJoinKeys(standing: DataFrame): Seq[String] =
    cellGroupColOf(standing).map(_._1).toSeq :+ "bucket"

  /** Restrict the standing cell-partitioned set to the cells a SMALL
    * (already-materialized, about-to-be-broadcast) probe side actually
    * touches, as LITERAL filters on the cell-layout columns — static
    * partition pruning that holds under ANY probe-side plan shape.
    * Dynamic partition pruning is heuristic: a streaming micro-batch
    * arrives as a LocalRelation/LogicalRDD whose default size estimate
    * makes the DPP benefit check decline, leaving the per-batch plan
    * scanning every cell directory (PlanSpec pins the literal form).
    * One extra collect over the probe side per call — batch-sized, and
    * the frame is checkpointed by the caller so nothing recomputes.
    * Above `maxLiterals` touched cells the filter is skipped whole: the
    * probe covers most of the codebook, pruning buys nothing, and a
    * 100k-literal IN would bloat the plan instead.
    *
    * The filter is one IN per key column, NOT per-tuple conjunctions —
    * and it is still EXACT on grouped layouts (ADVICE r16 raised the
    * cross-product worry), because the group column is a FUNCTION of
    * the cell id: every row and every probe was written/derived with
    * `cell_group_N = bucket mod N` ([[cellLayout]] / [[withCellGroup]]),
    * so a row passing `bucket IN T` necessarily has its group in
    * `{t mod N : t ∈ T}` — the conjunction admits exactly the rows with
    * `bucket IN T`, no stray (group, bucket) combinations exist to
    * admit. Directory pruning is group-granular (|touched groups| ≤ b,
    * so a probe of b cells still reads ≤ b directories); row pruning is
    * cell-exact. A per-tuple OR would buy nothing and bloat the plan at
    * 4096 touched cells. IvfIndexSpec pins the row-level exactness on a
    * grouped layout.
    */
  private[graft] def pruneToTouchedCells(
      standing: DataFrame, probeSide: DataFrame,
      maxLiterals: Int = 4096): DataFrame = {
    val keys = cellJoinKeys(standing)
    val touched = probeSide.select(keys.map(col): _*).distinct()
      .limit(maxLiterals + 1).collect()
    if (touched.length > maxLiterals) standing
    else keys.zipWithIndex.foldLeft(standing) { case (df, (k, i)) =>
      df.filter(col(k).isin(touched.map(_.get(i)).distinct.toIndexedSeq: _*))
    }
  }

  /** Codebook trainer for the persisted-index build/rebuild paths,
    * large-k-safe: seeds are sample rows, so the md5-ordered sample
    * widens to 2k once k outgrows the default limit (a 200k-cell
    * semantic codebook would otherwise silently cap at the 10000-row
    * sample), and past the routing threshold the Lloyd steps route
    * ([[trainCentroidsRouted]] — O(sample·√k·d) per iter, not
    * O(sample·k·d)). At ANN-scale k (≤ threshold, sample ≤ default)
    * this IS [[trainCentroids]] bit for bit — the regime every
    * index oracle pins.
    */
  private[graft] def indexTrainCentroids(
      spark: SparkSession, emb: DataFrame, k: Int, iters: Int,
      idCol: String, vecCol: String,
      knownRowCount: Long = 0L): Array[Array[Double]] = {
    val threshold = spark.conf
      .get("spark.graft.ann.routeThreshold",
        graft.operators.Dedup.routeThreshold.toString).toInt
    trainCentroidsRouted(
      sampleVectors(emb, idCol, vecCol, math.max(10000, 2 * k),
        knownRowCount),
      k, iters, threshold)
  }

  /** Lloyd training with two-level routed assignment steps for LARGE k:
    * at or below `routeThreshold` this IS [[trainCentroidsFromSample]]
    * (bit-identical — the oracle-mirrored regime); above it, each
    * iteration re-derives a √k coarse router from the CURRENT centroids
    * and assigns sample rows through it, dropping the driver trainer
    * from O(sample·k·d) to O(sample·√k·d) per iteration — without this
    * the trainer, not the corpus pass, becomes the bottleneck once the
    * codebook outgrows the old 10k cap (hierarchical k-means, public
    * method — e.g. Nistér & Stewénius's vocabulary tree, CVPR 2006).
    * No oracle can reach this regime (k > 2048 needs n > 256k vectors);
    * its contract is pinned by ExtendedSpec instead: delegation below
    * the threshold, determinism and flat-agreement above it.
    */
  private[graft] def trainCentroidsRouted(
      sample: Array[Array[Double]], nCentroids: Int, iters: Int,
      routeThreshold: Int = 2048): Array[Array[Double]] = {
    if (nCentroids <= routeThreshold)
      return trainCentroidsFromSample(sample, nCentroids, iters)
    // HUGE codebooks (k above treeTrainThreshold — the 2M+-row semantic
    // builds) take the hierarchical trainer: the two-level routed Lloyd
    // below is O(sample·√k·d) per iteration with sample ∝ 2k, i.e.
    // ~O(k^1.5) single-threaded, and SEMDEDUP_SCALE_r19 measured it as
    // the build's asymptotic ceiling (train_s 10.49 → 89.98 for a 2.5×
    // row step, exp 2.35, while every other stage is cluster-parallel —
    // VERDICT r19 next #2). The tree is O(sample·b·log_b k·d) total and
    // parallel across driver cores. The two-level path stays untouched
    // in its regime: its bit-parity contract (delegation below the
    // threshold, flat agreement on separated blobs) is spec-pinned.
    if (nCentroids > treeTrainThreshold)
      return trainCentroidsTree(sample, nCentroids, iters)
    var centroids = sample.take(nCentroids).map(_.clone())
    for (_ <- 1 to iters) {
      val (coarse, members) = coarseRouter(centroids, sqrtCells(nCentroids), 2)
      val sums = Array.fill(centroids.length)(new Array[Double](centroids(0).length))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        val mem = members(nearest(coarse, v))
        var best = mem(0)
        var bestD = Double.MaxValue
        var m = 0
        while (m < mem.length) {
          val cen = centroids(mem(m))
          var d = 0.0
          var j = 0
          while (j < v.length) { val diff = cen(j) - v(j); d += diff * diff; j += 1 }
          if (d < bestD) { bestD = d; best = mem(m) }
          m += 1
        }
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids
  }

  /** Above this codebook size [[trainCentroidsRouted]] dispatches to
    * [[trainCentroidsTree]]. 16384 keeps every oracle-scale and
    * ANN-scale build (k ≤ a few thousand) and the spec-pinned
    * mid-size routed regime on their existing paths; only the
    * semantic-index builds over multi-million-row corpora (k = n/125)
    * cross it, and there the two-level trainer's ~O(k^1.5) driver cost
    * is the measured ceiling (SEMDEDUP_SCALE_r19: exp 2.35).
    */
  private[graft] val treeTrainThreshold = 16384

  /** Branch factor of the hierarchical trainer: per level each node
    * splits its rows across ≤256 children, so per-row routing work per
    * level is a flat 256-way argmin and depth is log₂₅₆ k (3 levels at
    * k = 2M). 256 balances per-level cost (∝ b) against depth (∝ 1/log b).
    */
  private[graft] val treeBranch = 256

  /** Hierarchical k-means ("vocabulary tree", Nistér & Stewénius CVPR
    * 2006 — the public method the routed trainer's scaladoc already
    * cites) for HUGE codebooks: recursively split the sample into ≤
    * [[treeBranch]] cells per level until a node's centroid budget fits
    * one flat Lloyd, apportioning each node's budget across its
    * children proportional to their row counts (largest remainder,
    * capped by rows — cells that attract more sample rows get more
    * centroids, which is what keeps corpus cells near the 125-row
    * target). Total driver work is O(sample·b·d·log_b k) — measured
    * exp ~1.0/decade where the two-level routed Lloyd reads 2.35 — and
    * every phase is parallel over driver cores: per-node coarse
    * training, per-chunk row assignment, per-leaf Lloyd all write
    * disjoint slots and merge in fixed index order, so the output is
    * DETERMINISTIC under any thread schedule. At the 250M-row
    * extrapolation (k = 2M, sample = 4M) the remaining driver bound is
    * ~5·10¹⁰ mults ≈ seconds-to-a-minute across 32 cores — no longer
    * the build's asymptotic ceiling (the cluster-parallel corpus
    * assignment is). A Spark fan-out of the same step would pay
    * broadcast+collect barriers per level for sub-minute work; the
    * driver tree keeps the build's only collect the sample itself.
    *
    * Output contract matches the flat/routed trainers: exactly
    * `nCentroids` rows when `sample.length > nCentroids` (leaf Lloyd
    * over ≥ kᵢ rows each), the flat trainer's own short-array
    * degenerate otherwise. Centroid ORDER is tree order (children in
    * coarse-cell index order) — a permutation of no significance to
    * any caller: every consumer treats the array index as an opaque
    * bucket id.
    */
  private[graft] def trainCentroidsTree(
      sample: Array[Array[Double]], nCentroids: Int,
      iters: Int): Array[Array[Double]] = {
    if (sample.length <= nCentroids || nCentroids <= treeBranch)
      return trainCentroidsFromSample(sample, nCentroids, iters)
    val out = new Array[Array[Double]](nCentroids)
    val cores = math.max(1, Runtime.getRuntime.availableProcessors())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(cores)
    // phase-synchronous parallel map: tasks joined in ORDER before the
    // next phase starts — no nested submission, so a fixed pool cannot
    // deadlock, and results are position-stable regardless of schedule
    def parMap[A, B](items: IndexedSeq[A])(f: A => B): IndexedSeq[B] = {
      import scala.jdk.CollectionConverters._
      val futures = pool.invokeAll(
        items.map(a => new java.util.concurrent.Callable[B] {
          override def call(): B = f(a)
        }).asJava)
      futures.asScala.map(_.get()).toIndexedSeq
    }
    try {
      // (rows, k, offset): this node owns out[offset, offset + k)
      var frontier: IndexedSeq[(Array[Array[Double]], Int, Int)] =
        IndexedSeq((sample, nCentroids, 0))
      while (frontier.nonEmpty) {
        val (leaves, internal) =
          frontier.partition { case (rows, k, _) =>
            k <= treeBranch || rows.length <= k
          }
        parMap(leaves) { case (rows, k, off) =>
          val cs = trainCentroidsFromSample(rows, k, iters)
          System.arraycopy(cs, 0, out, off, cs.length)
        }
        // internal nodes: train a b-way coarse split on a hash-order
        // prefix subsample (the sample is md5-ordered, so any prefix —
        // of the node's rows, which inherit that order through stable
        // partitioning — is a uniform subsample of the node)
        val coarse = parMap(internal) { case (rows, _, _) =>
          trainCentroidsFromSample(
            rows.take(math.min(rows.length, 8 * treeBranch)),
            treeBranch, iters)
        }
        // row → coarse cell, chunk-parallel across ALL (node, chunk)
        // pairs so the single-node root level still uses every core
        val assigns = internal.map { case (rows, _, _) =>
          new Array[Int](rows.length)
        }
        val chunk = 8192
        parMap(for {
          ni <- internal.indices
          start <- 0 until internal(ni)._1.length by chunk
        } yield (ni, start)) { case (ni, start) =>
          val rows = internal(ni)._1
          val cs = coarse(ni)
          val idx = assigns(ni)
          var i = start
          val end = math.min(rows.length, start + chunk)
          while (i < end) { idx(i) = nearest(cs, rows(i)); i += 1 }
        }
        frontier = parMap(internal.indices) { ni =>
          val (rows, k, off) = internal(ni)
          val nCells = coarse(ni).length
          val counts = new Array[Int](nCells)
          assigns(ni).foreach(c => counts(c) += 1)
          val ks = apportion(k, counts)
          // stable partition: each cell's rows keep their relative
          // (hash) order, so deeper prefix subsamples stay uniform
          val cells = Array.tabulate(nCells)(c =>
            new scala.collection.mutable.ArrayBuffer[Array[Double]](counts(c)))
          rows.indices.foreach(i => cells(assigns(ni)(i)) += rows(i))
          val offs = ks.scanLeft(off)(_ + _)
          (0 until nCells).collect {
            case c if ks(c) > 0 => (cells(c).toArray, ks(c), offs(c))
          }
        }.flatten
      }
    } finally pool.shutdown()
    out
  }

  /** Largest-remainder apportionment of `k` centroids across cells
    * proportional to their row counts, each share capped by the cell's
    * own rows (a cell can never owe more centroids than it has rows to
    * train them on). Deterministic: remainders tie-break on cell
    * index. Requires Σcounts ≥ k; returns shares summing exactly to k.
    */
  private[graft] def apportion(k: Int, counts: Array[Int]): Array[Int] = {
    val total = counts.map(_.toLong).sum
    require(total >= k, s"cannot apportion $k centroids over $total rows")
    val ks = new Array[Int](counts.length)
    val frac = new Array[Double](counts.length)
    var placed = 0
    var c = 0
    while (c < counts.length) {
      val quota = k.toDouble * counts(c) / total
      ks(c) = math.min(counts(c), quota.toInt)
      frac(c) = quota - quota.toInt
      placed += ks(c)
      c += 1
    }
    // distribute the remainder by (fraction desc, index asc) among
    // cells with spare capacity; loop — caps can force extra rounds,
    // and Σcounts ≥ k guarantees termination
    while (placed < k) {
      val order = counts.indices
        .filter(c => ks(c) < counts(c))
        .sortBy(c => (-frac(c), c))
      var i = 0
      while (i < order.length && placed < k) {
        ks(order(i)) += 1
        placed += 1
        i += 1
      }
    }
    ks
  }

  private def nearest(centroids: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) {
        val diff = centroids(c)(i) - v(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** IVF top-k: assign every vector to its nearest centroid (single JVM
    * pass, [[nearestUdf]]), then for each query probe the `nprobe` nearest
    * buckets only. The per-bucket search is a hash join on bucket id
    * instead of a cross join.
    */
  def ivfTopK(
      spark: SparkSession, emb: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = trainCentroids(emb, nCentroids, iters = 3, idCol, vecCol)
    val assign = nearestUdf(centroids)
    val probe = probeUdf(centroids, nprobe)

    val bucketed = emb.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("n_vec"), l2Norm(col(vecCol)).as("n_nrm"),
      assign(col(vecCol)).as("bucket"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_nrm"),
      explode(probe(col(vecCol))).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Persist an IVF index into the set catalog: the codebook as a tiny
    * `<name>_centroids` set and the assigned vectors (id, vector, norm,
    * bucket) as `<name>_vectors` PARTITIONED BY bucket — one directory per
    * coarse cell. Build once, search many times: the corpus is scanned
    * once here, and every later search reads only the probed buckets'
    * directories (partition pruning at the file listing, dynamic at run
    * time via the broadcast probe join), never the whole index. This is
    * the placement thesis applied to ANN: the layout, not the operator,
    * makes the query cheap.
    */
  def buildIvfIndex(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String, emb: DataFrame,
      nCentroids: Int = 16, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      knownRowCount: Long = 0L): Unit = {
    // knownRowCount seeds the trainer's wide-sample prefilter when the
    // caller already paid for a count (persistSemanticIndex's auto
    // path, a catalog set's sidecar) — at semantic k the sample is 2k
    // rows and an unseeded prefilter can pay extra relax scans of the
    // whole corpus (ADVICE r17 / VERDICT r18 next #4)
    val centroids = indexTrainCentroids(spark, emb, nCentroids, iters,
      idCol, vecCol, knownRowCount)
    import spark.implicits._
    catalog.createSet(db, s"${name}_centroids",
      withRouteThreshold(spark,
        centroids.zipWithIndex
          .map { case (v, b) => (b.toLong, v.toSeq) }.toSeq
          .toDF("bucket", "centroid")),
      policy = "none")
    // routed above the threshold (semantic-scale codebooks) — the SAME
    // rule every later append/probe derives FROM THE PERSISTED MARKER,
    // so assignments never mix even across sessions with different
    // conf; grouped directories above the fanout bound, likewise
    // schema-witnessed
    val assign = indexAssignUdf(spark, centroids)
    val (partCol, laidOut) = cellLayout(spark,
      emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
        l2Norm(col(vecCol)).as("n_nrm"), assign(col(vecCol)).as("bucket")),
      centroids.length)
    catalog.createPartitionedSet(db, s"${name}_vectors", laidOut, partCol)
    persistBuiltRows(spark, catalog, db, name)
  }

  /** Incrementally extend a persisted IVF index: assign the NEW vectors
    * with the index's EXISTING codebook and append them into the
    * bucket-partitioned vector set — no retrain, no rewrite of standing
    * data, one scan of the batch. This is how a standing ANN index keeps
    * up with a continuously-embedding ingest pipeline; the codebook only
    * needs retraining when the corpus distribution drifts enough that
    * cell sizes skew. `rebuildIfDrifted` makes that policy decision
    * automatic, like the PQ/IVF-PQ appends' — but note the cost
    * asymmetry: an IVF rebuild rewrites the WHOLE bucket-partitioned
    * vector set (the cells ARE the corpus layout), where the compressed
    * tiers rewrite only codes. The ivfrecall soak also shows append-only
    * IVF tracks the retrained codebook within 0.1 under drift, so the
    * default here stays manual; enable the trigger when cell-size skew,
    * not recall, is the concern.
    * Search results over build(A)+append(B) are IDENTICAL to an index
    * whose vectors were all assigned under A's codebook in one pass —
    * assignment depends only on (vector, codebook).
    */
  def appendToIvfIndex(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String, newEmb: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      rebuildIfDrifted: Boolean = false,
      driftFraction: Double = 0.5): Unit = {
    val (centroids, threshold) =
      loadCentroidsWithThreshold(spark, catalog, db, name)
    // the standing schema is the witness for BOTH regimes: arrivals
    // assign under the index's persisted routing threshold (never the
    // session conf), and grouped sets append into their group
    // directories under the modulus the build wrote — each parsed from
    // column names, atomic with the data
    val assign = indexAssignUdfFor(threshold, centroids)
    val standing = catalog.scanSet(db, s"${name}_vectors")
    val partCol = cellGroupColOf(standing).map(_._1).getOrElse("bucket")
    catalog.appendToPartitionedSet(db, s"${name}_vectors",
      withCellGroup(standing,
        newEmb.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
          l2Norm(col(vecCol)).as("n_nrm"), assign(col(vecCol)).as("bucket"))),
      partCol)
    if (rebuildIfDrifted &&
        appendedDriftFraction(catalog, db, name) >= driftFraction)
      rebuildIvfIndex(spark, catalog, db, name)
  }

  /** IVF form of [[rebuildPqIndex]]: retrain the coarse codebook from
    * the standing vectors set (same md5-ordered sample a from-scratch
    * [[ivfTopK]] trains on, so post-rebuild recall equals the retrained
    * line exactly — soak-asserted) and re-partition the corpus under the
    * new cells. The rewrite goes to a STAGING set and swaps in via
    * [[graft.storage.SetCatalog.swapSetGroup]] (marker-committed
    * remove+rename) — source and destination are the same set here (the
    * cells are the corpus layout), so an in-place overwrite would read
    * what it is deleting.
    */
  /** `nCentroids = 0` (the default) keeps the standing codebook's size;
    * a positive value RE-SIZES the codebook at rebuild — the semantic
    * tier's need, where k tracks corpus growth by the autoClusters rule
    * ([[graft.operators.Dedup.rebuildSemanticIndex]] computes it from
    * the sidecar row count and passes it here).
    */
  def rebuildIvfIndex(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String, iters: Int = 3, nCentroids0: Int = 0): Unit = {
    recoverStagedSwaps(catalog, db, Seq("vectors", "centroids")
      .map(s => s"${name}_$s"))
    val nCentroids = if (nCentroids0 > 0) nCentroids0
      else catalog.scanSet(db, s"${name}_centroids").count().toInt
    val vecs = catalog.scanSet(db, s"${name}_vectors")
      .select(col("neighbor_id"), col("n_vec"), col("n_nrm"))
    // the standing corpus's sidecar already carries its rowcount —
    // seed the wide-sample prefilter from it (ADVICE r17)
    val centroids = indexTrainCentroids(spark, vecs, nCentroids, iters,
      "neighbor_id", "n_vec",
      catalog.meta(db, s"${name}_vectors").map(_.rows).getOrElse(0L))
    import spark.implicits._
    val assign = indexAssignUdf(spark, centroids)
    // Stage the re-partitioned corpus AND the new codebook before
    // touching live state — the whole-corpus rewrite (the expensive
    // part; the cells ARE the corpus layout here) runs while searches
    // still see the consistent old (centroids, vectors) pair, and a
    // crash before the swaps leaves the live index untouched. The two
    // swaps commit as ONE marker group (swapSetGroup): a crash between
    // them (new vectors under the old codebook) or inside either
    // remove→rename window is FINISHED — not discarded — by the next
    // rebuild's recoverSwapGroup preamble or by SetCatalog.recoverAll
    // at catalog open, so a mixed-generation index can serve only
    // inside the crash-to-recovery window, never past it.
    val (partCol, laidOut) = cellLayout(spark,
      vecs.select(col("neighbor_id"), col("n_vec"), col("n_nrm"),
        assign(col("n_vec")).as("bucket")),
      centroids.length)
    catalog.createPartitionedSet(db, s"${name}_vectors_rebuild", laidOut,
      partCol)
    catalog.markStaging(db, s"${name}_vectors_rebuild")
    catalog.createSet(db, s"${name}_centroids_rebuild",
      withRouteThreshold(spark,
        centroids.zipWithIndex
          .map { case (v, b) => (b.toLong, v.toSeq) }.toSeq
          .toDF("bucket", "centroid")),
      policy = "none")
    catalog.markStaging(db, s"${name}_centroids_rebuild")
    swapInStaged(catalog, db,
      Seq(s"${name}_vectors", s"${name}_centroids"))
    persistBuiltRows(spark, catalog, db, name)
  }

  /** Streaming form of [[appendToIvfIndex]]: every micro-batch of
    * arriving embeddings is assigned under the standing codebook and
    * appended to the index — the continuously-embedding ingest pipeline
    * end to end. Batching-invariant by construction (a vector's bucket
    * depends only on the vector and the codebook), so any batching of
    * the same arrivals produces the same index as one batch append.
    */
  def streamAppendToIvfIndex(
      stream: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      rebuildIfDrifted: Boolean = false,
      driftFraction: Double = 0.5): Unit = {
    val spark = stream.sparkSession
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        appendToIvfIndex(spark, catalog, db, name, batch.toDF(), idCol, vecCol,
          rebuildIfDrifted, driftFraction)
        ()
      }
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Product-quantization codebooks: the vector's `m` disjoint dim-slices
    * each get an independent k-means sub-codebook trained over the SAME
    * deterministic-hash sample as [[trainCentroids]] (smallest md5(id)
    * rows — uniform, rerun-stable, oracle-reproducible). Same Lloyd
    * kernel per subspace: seed = first `kSub` sample slices, sequential
    * diff² accumulation, first-min tiebreak, empty clusters keep their
    * centroid. Returns codebooks(sub)(centroid)(dimInSub).
    *
    * Why PQ at 100 TB: a 64-float embedding is 256 B; its PQ code is `m`
    * sub-centroid ids of log2(kSub) bits each — 8 B packed at the
    * 16×16 defaults, a 32× smaller table to scan.
    * ADC search reads ONLY the code table; full vectors are touched for
    * the shortlist re-rank alone. The compressed scan is what makes
    * corpus-wide candidate generation IO-feasible where the raw vectors
    * would be 100 TB (PQ per Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011 — public method).
    */
  /** Unit-normalize (sequential Σv² then sqrt — the oracle computes the
    * same sum); the zero vector stays zero. PQ here targets COSINE
    * ranking: over unit vectors ‖q−n‖² = 2 − 2·cos(q,n), so Euclidean
    * ADC over normalized codes orders candidates by cosine — without
    * this, ADC ranks by raw Euclidean distance, which disagrees with
    * cosine whenever magnitudes vary (measured: shortlist recall drops
    * from ~0.9 to ~0.2 on the fixture).
    */
  private def unitNormalize(v: Seq[Float]): Array[Double] = {
    val arr = new Array[Double](v.length)
    var i = 0
    while (i < arr.length) { arr(i) = v(i).toDouble; i += 1 }
    unitNormalized(arr)
  }

  /** Same kernel over an already-converted double vector (the shared
    * training sample); `v` is not mutated. Sequential Σv² in index
    * order, identical to the Seq[Float] path bit for bit.
    */
  private def unitNormalized(v: Array[Double]): Array[Double] = {
    val arr = new Array[Double](v.length)
    var s = 0.0
    var i = 0
    while (i < arr.length) { val d = v(i); arr(i) = d; s += d * d; i += 1 }
    val nrm = math.sqrt(s)
    if (nrm > 0) { i = 0; while (i < arr.length) { arr(i) /= nrm; i += 1 } }
    arr
  }

  def trainPqCodebooks(
      emb: DataFrame, m: Int, kSub: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      sampleLimit: Int = 10000,
      knownRowCount: Long = 0L): Array[Array[Array[Double]]] =
    trainPqCodebooksFromSample(
      sampleVectors(emb, idCol, vecCol, sampleLimit, knownRowCount),
      m, kSub, iters)

  private[operators] def trainPqCodebooksFromSample(
      rawSample: Array[Array[Double]], m: Int, kSub: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    val sample = rawSample.map(unitNormalized)
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    Array.tabulate(m) { j =>
      val lo = j * dsub
      val slices = sample.map(v => java.util.Arrays.copyOfRange(v, lo, lo + dsub))
      var centroids = slices.take(kSub).map(_.clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(centroids.length)(new Array[Double](dsub))
        val counts = new Array[Long](centroids.length)
        slices.foreach { v =>
          val c = nearest(centroids, v)
          counts(c) += 1
          var i = 0
          while (i < dsub) { sums(c)(i) += v(i); i += 1 }
        }
        centroids = centroids.indices.map { c =>
          if (counts(c) == 0) centroids(c)
          else sums(c).map(_ / counts(c))
        }.toArray
      }
      centroids
    }
  }

  /** Encode a vector as its `m` sub-centroid ids — one tight JVM pass,
    * same argmin kernel as [[nearestUdf]] per subspace. The code column
    * IS the compressed index.
    */
  def pqEncodeUdf(codebooks: Array[Array[Array[Double]]]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val m = codebooks.length
    udf((v: Seq[Float]) => {
      val dsub = codebooks(0)(0).length
      // mirror trainPqCodebooksFromSample's divisibility require: a
      // mismatched vector would otherwise surface as an opaque
      // ArrayIndexOutOfBounds inside the executor (or silently ignore
      // trailing dims when the vector is longer than the codebooks)
      require(v.length == m * dsub,
        s"PQ encode: vector dim ${v.length} != m*dsub = ${m * dsub}")
      val nv = unitNormalize(v)
      val out = new Array[Int](m)
      var j = 0
      while (j < m) {
        val cb = codebooks(j)
        val lo = j * dsub
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          var d = 0.0
          var i = 0
          while (i < dsub) {
            val diff = cb(c)(i) - nv(lo + i); d += diff * diff; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(j) = best
        j += 1
      }
      out.toSeq
    })
  }

  /** Per-query ADC lookup table: lut(sub)(centroid) = squared distance
    * from the query's dim-slice to that sub-centroid. Computed ON THE
    * EXECUTORS as a column of the (broadcast-small) query frame — no
    * driver-side gather of query vectors.
    */
  def pqLutUdf(codebooks: Array[Array[Array[Double]]]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((v: Seq[Float]) => {
      val m = codebooks.length
      val dsub = codebooks(0)(0).length
      require(v.length == m * dsub,
        s"PQ LUT: query dim ${v.length} != m*dsub = ${m * dsub}")
      val nv = unitNormalize(v)
      Seq.tabulate(m) { j =>
        val cb = codebooks(j)
        val lo = j * dsub
        Seq.tabulate(cb.length) { c =>
          var d = 0.0
          var i = 0
          while (i < dsub) {
            val diff = cb(c)(i) - nv(lo + i); d += diff * diff; i += 1
          }
          d
        }
      }
    })

  /** ADC shortlist cut shared by every PQ search form: candidate
    * (query_id, neighbor_id, codes, lut) pairs → the `shortlist`·k best
    * per query by rounded ADC with an id tiebreak. How the candidates
    * were generated (full code-table cross vs bucket-pruned join) is the
    * caller's choice; the cut contract — round to 1e-6 BEFORE ranking so
    * the boundary is FP-associativity-proof, first-id tiebreak — lives
    * here once, mirrored by every oracle's `short` CTE.
    */
  private def adcShortlist(pairs: DataFrame, shortlist: Int, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id"))
    pairs
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", round(
        graft.functions.VectorExpressions.adcNative(col("codes"), col("lut")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= shortlist * k)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Exact rounded-cosine re-rank of a (query_id, neighbor_id) shortlist
    * against a (neighbor_id, n_vec, n_nrm) vector frame — the shared
    * closing stage of every PQ search form (id-equi joins only; the
    * query side broadcasts). Mirrored by every oracle's `scored` tail.
    */
  private def rerankExact(
      short: DataFrame, vectors: DataFrame, queries: DataFrame, k: Int,
      idCol: String, vecCol: String): DataFrame = {
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_nrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    short.join(vectors, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos",
        round(dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** (neighbor_id, n_vec, n_nrm) projection for [[rerankExact]]. */
  private def vectorsWithNorm(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
      l2Norm(col(vecCol)).as("n_nrm"))

  /** Persist PQ sub-codebooks as the tiny `<name>_codebooks` set (one
    * row per (sub, centroid), components as an array) — shared by the
    * PQ and IVF-PQ builders.
    */
  private def persistCodebooks(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String,
      codebooks: Array[Array[Array[Double]]],
      suffix: String = ""): Unit = {
    import spark.implicits._
    catalog.createSet(db, s"${name}_codebooks$suffix",
      codebooks.zipWithIndex.flatMap { case (cb, j) =>
        cb.zipWithIndex.map { case (v, c) => (j, c.toLong, v.toSeq) }
      }.toSeq.toDF("sub", "centroid", "components"),
      policy = "none")
    // a staged generation is tagged as catalog-owned the moment it
    // exists, so recoverAll's convention sweep may resolve it
    if (suffix.nonEmpty) catalog.markStaging(db, s"${name}_codebooks$suffix")
  }

  /** Crash-recovery preamble for the rebuilds' staged swaps — delegates
    * to [[graft.storage.SetCatalog.recoverSwapGroup]], whose GROUP
    * intent marker decides authority for all of a rebuild's sets at
    * once: a crash between two member swaps no longer leaves a
    * mixed-generation live index (new codes under old codebooks) for
    * the next rebuild run to discover — recovery finishes every member.
    * The earlier sidecar-inference version had a destructive hole on
    * top: `removeSet` deletes the data tree BEFORE its sidecar, so a
    * crash inside the target's remove left a live-LOOKING target (stale
    * sidecar, no data) next to the finished staging set, and the
    * inference discarded the staging set — the only copy.
    */
  private def recoverStagedSwaps(
      catalog: graft.storage.SetCatalog, db: String,
      targets: Seq[String]): Unit =
    catalog.recoverSwapGroup(db, targets.map(t => s"${t}_rebuild" -> t))

  /** The swap step itself: [[graft.storage.SetCatalog.swapSetGroup]] —
    * one marker for the whole set group, then remove+rename per member,
    * then marker clear. A crash anywhere in the sequence (including
    * BETWEEN members) converges under [[recoverStagedSwaps]].
    */
  private def swapInStaged(
      catalog: graft.storage.SetCatalog, db: String,
      targets: Seq[String]): Unit =
    catalog.swapSetGroup(db, targets.map(t => s"${t}_rebuild" -> t))

  /** Asymmetric-distance top-k with exact re-rank: encode the corpus once
    * (the compressed code table), broadcast the queries WITH their LUTs,
    * shortlist the `shortlist`·k best codes per query by ADC (sum of `m`
    * table lookups per pair — no per-pair float dot product), then
    * re-rank the shortlist alone by exact rounded cosine against the full
    * vectors. ADC is rounded to 1e-6 with an id tiebreak before the
    * shortlist cut so the cut is FP-associativity-proof — the oracle
    * computes the same sums in SQL grouping order.
    *
    * Scale shape: the expensive corpus-wide pass touches only
    * (id, m-byte code); the full-vector table is hash-joined for
    * shortlist·k·|queries| rows only. Composes with IVF (probe buckets,
    * then ADC within them) when even the code table warrants pruning.
    */
  def pqTopK(
      spark: SparkSession, emb: DataFrame, queries: DataFrame, k: Int,
      m: Int = 16, kSub: Int = 16, iters: Int = 2, shortlist: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val codebooks = trainPqCodebooks(emb, m, kSub, iters, idCol, vecCol)
    val encode = pqEncodeUdf(codebooks)
    val lut = pqLutUdf(codebooks)
    val codes = emb.select(col(idCol).as("neighbor_id"), encode(col(vecCol)).as("codes"))
      .transform(Parallelism.ensureWidth)
    val q = queries.select(col(idCol).as("query_id"), lut(col(vecCol)).as("lut"))
    val short = adcShortlist(codes.crossJoin(broadcast(q)), shortlist, k)
    rerankExact(short, vectorsWithNorm(emb, idCol, vecCol), queries, k, idCol, vecCol)
  }

  /** IVF-PQ: the production ANN shape at corpus scale — coarse cells
    * prune the candidate set (each query touches `nprobe` of
    * `nCentroids` buckets), and WITHIN the probed buckets ranking runs
    * on the compressed codes (ADC), with the full vectors touched only
    * for the exact re-rank of the shortlist. Both stages reuse the
    * standalone kernels unchanged: the coarse quantizer is [[ivfTopK]]'s
    * (raw-vector cells), the code stage is [[pqTopK]]'s (unit-sphere
    * codebooks), so the oracle is their two CTE chains composed.
    *
    * Plan shape: one hash join (bucket) between the code table and the
    * broadcast probes — no cross join anywhere — then the windowed
    * ADC cut and the id-equi re-rank joins. At 100 TB: the bucket join
    * reads nprobe/nCentroids of the CODE table (compressed AND pruned);
    * nothing scans the raw vectors but the final shortlist join.
    */
  def ivfPqTopK(
      spark: SparkSession, emb: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nprobe: Int = 4,
      m: Int = 16, kSub: Int = 16, iters: Int = 2, shortlist: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // ONE sample scan feeds both trainers (see sampleVectors)
    val sample = sampleVectors(emb, idCol, vecCol, 10000)
    val centroids = trainCentroidsFromSample(sample, nCentroids, iters = 3)
    val codebooks = trainPqCodebooksFromSample(sample, m, kSub, iters)
    val assign = nearestUdf(centroids)
    val probe = probeUdf(centroids, nprobe)
    val encode = pqEncodeUdf(codebooks)
    val lut = pqLutUdf(codebooks)
    val codes = emb.select(col(idCol).as("neighbor_id"),
      assign(col(vecCol)).as("bucket"), encode(col(vecCol)).as("codes"))
      .transform(Parallelism.ensureWidth)
    val probes = queries.select(col(idCol).as("query_id"),
      explode(probe(col(vecCol))).as("bucket"), lut(col(vecCol)).as("lut"))
    // a vector lives in exactly one cell, so the bucket join emits each
    // (query, neighbor) pair at most once — no dedup stage needed
    val short = adcShortlist(codes.join(broadcast(probes), Seq("bucket")), shortlist, k)
    rerankExact(short, vectorsWithNorm(emb, idCol, vecCol), queries, k, idCol, vecCol)
  }

  /** Persist an IVF-PQ index — the full production ANN layout at corpus
    * scale: coarse centroids + PQ sub-codebooks (both tiny), the
    * compressed codes PARTITIONED BY coarse bucket (one directory per
    * cell — searches list only probed cells, and each cell's bytes are
    * the CODES, not the vectors), and the full vectors hash-placed on id
    * for the shortlist re-rank only. Probing an index of 100 TB of raw
    * vectors reads nprobe/nCentroids of a ~1.5 TB code table plus
    * shortlist·k·|queries| vector rows.
    */
  def buildIvfPqIndex(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String, emb: DataFrame,
      nCentroids: Int = 16, m: Int = 16, kSub: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      numBuckets: Int = 0,
      advisor: Option[graft.advisor.PlacementAdvisor] = None,
      targetRowsPerBucket: Long = 1L << 22): Unit = {
    // ONE sample scan feeds both trainers (see sampleVectors)
    val sample = sampleVectors(emb, idCol, vecCol, 10000)
    val centroids = trainCentroidsFromSample(sample, nCentroids, iters = 3)
    val codebooks = trainPqCodebooksFromSample(sample, m, kSub, iters)
    import spark.implicits._
    catalog.createSet(db, s"${name}_centroids",
      centroids.zipWithIndex
        .map { case (v, b) => (b.toLong, v.toSeq) }.toSeq
        .toDF("bucket", "centroid"),
      policy = "none")
    persistCodebooks(spark, catalog, db, name, codebooks)
    val assign = nearestUdf(centroids)
    val encode = pqEncodeUdf(codebooks)
    catalog.createPartitionedSet(db, s"${name}_codes",
      emb.select(col(idCol).as("neighbor_id"), encode(col(vecCol)).as("codes"),
        assign(col(vecCol)).as("bucket")),
      "bucket")
    // the vectors set is hash-placed on id and corpus-sized — its bucket
    // count takes the same sizing rule as buildPqIndex's (explicit, else
    // the advisor over the corpus rowcount, else the session default);
    // the CODES layout needs no count: it is directory-partitioned by
    // coarse cell, where nCentroids IS the layout. The advisor's rowcount
    // comes off the just-written code set's sidecar (one code row per
    // corpus vector, counted by its post-write footer pass) — NOT an
    // extra emb.count() scan of the whole corpus.
    // the no-advisor default sizes from the same sidecar rowcount the
    // advisor reads (PlacementAdvisor.bucketCountFor) instead of the
    // session's shuffle-partition constant — no extra corpus scan
    val n = if (numBuckets > 0) numBuckets
      else {
        val rows = catalog.meta(db, s"${name}_codes").map(_.rows)
          .getOrElse(emb.count())
        advisor
          .map(_.recommendBuckets(s"$db.${name}_vectors", rows,
            targetRowsPerBucket))
          .getOrElse(graft.advisor.PlacementAdvisor
            .bucketCountFor(rows, targetRowsPerBucket))
      }
    catalog.createSet(db, s"${name}_vectors",
      emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
        l2Norm(col(vecCol)).as("n_nrm")),
      partitionColumn = Some("neighbor_id"), numPartitions = n)
    persistBuiltRows(spark, catalog, db, name)
  }

  /** Incrementally extend a persisted IVF-PQ index: assign + encode the
    * NEW vectors under the STANDING coarse centroids and codebooks,
    * append into the bucket-partitioned code set and the vector set. No
    * retrain, no rewrite; build(A)+append(B) ≡ one-pass under A's
    * models, since both assignment and encoding depend only on
    * (vector, model).
    *
    * `rebuildIfDrifted = true` adds the production rebuild policy the
    * append-under-drift soaks motivated (README recall table: append-only
    * IVF-PQ recall sinks to 0.34 at m=16 under rotation drift — stale
    * models code drifted vectors badly, and append-only operation never
    * recovers): when the appended fraction since the last (re)train
    * reaches `driftFraction`, [[rebuildIvfPqIndex]] retrains both models
    * from the standing vectors set and re-encodes the code set in place.
    * The trigger reads two sidecar rowcounts — no corpus scan; the
    * rebuild itself costs one scan of the vectors set, amortized over
    * `driftFraction·n` appended rows.
    */
  def appendToIvfPqIndex(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String, newEmb: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      rebuildIfDrifted: Boolean = false,
      driftFraction: Double = 0.5): Unit = {
    val assign = nearestUdf(loadIvfCentroids(catalog, db, name))
    val encode = pqEncodeUdf(loadPqCodebooks(catalog, db, name))
    catalog.appendToPartitionedSet(db, s"${name}_codes",
      newEmb.select(col(idCol).as("neighbor_id"), encode(col(vecCol)).as("codes"),
        assign(col(vecCol)).as("bucket")),
      "bucket")
    catalog.appendToSet(db, s"${name}_vectors",
      newEmb.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
        l2Norm(col(vecCol)).as("n_nrm")))
    if (rebuildIfDrifted &&
        appendedDriftFraction(catalog, db, name) >= driftFraction)
      rebuildIvfPqIndex(spark, catalog, db, name)
  }

  /** Rows the standing models were last trained over, persisted as the
    * one-row `<name>_built` set at build/rebuild time — the denominator
    * of [[appendedDriftFraction]]. The rowcount comes from the vectors
    * set's sidecar (already computed by its post-write count), so this
    * costs one tiny parquet write and zero corpus scans.
    */
  private def persistBuiltRows(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String): Unit = {
    import spark.implicits._
    val rows = catalog.meta(db, s"${name}_vectors").map(_.rows).getOrElse(0L)
    catalog.createSet(db, s"${name}_built",
      Seq(rows).toDF("rows_at_build"), policy = "none")
  }

  /** Fraction of the index appended since its models were last
    * (re)trained: (rows_now - rows_at_build) / rows_at_build. Both
    * numbers are sidecar reads — O(1), no corpus scan. 0.0 for indexes
    * built before the `<name>_built` marker existed (they opt into the
    * rebuild policy at their first rebuild).
    */
  def appendedDriftFraction(
      catalog: graft.storage.SetCatalog, db: String, name: String): Double = {
    val total = catalog.meta(db, s"${name}_vectors").map(_.rows).getOrElse(0L)
    if (catalog.meta(db, s"${name}_built").isEmpty) 0.0
    else {
      val base = catalog.scanSet(db, s"${name}_built")
        .collect()(0).getLong(0)
      if (base <= 0) 0.0 else (total - base).toDouble / base
    }
  }

  /** Retrain a persisted PQ index's codebooks from its OWN standing
    * vectors set and re-encode the code set in place — the rebuild the
    * appendTo* scaladocs name as the answer once drift bites. Hyperparams
    * (m, kSub) are read off the standing codebooks, layout off the codes
    * sidecar, so the call needs nothing but the index name. Because
    * [[sampleVectors]] orders by md5(id) — not physical row order — the
    * retrain sample over the vectors set is IDENTICAL to a from-scratch
    * [[pqTopK]] train over the same corpus, so post-rebuild recall equals
    * the retrained line exactly (soak-asserted, pqrecall family).
    */
  def rebuildPqIndex(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String, iters: Int = 2): Unit = {
    recoverStagedSwaps(catalog, db, Seq("codes", "codebooks")
      .map(s => s"${name}_$s"))
    val old = loadPqCodebooks(catalog, db, name)
    val m = old.length
    val kSub = old(0).length
    val vecs = catalog.scanSet(db, s"${name}_vectors")
    val codebooks = trainPqCodebooks(vecs, m, kSub, iters, "neighbor_id",
      "n_vec", knownRowCount =
        catalog.meta(db, s"${name}_vectors").map(_.rows).getOrElse(0L))
    val cm = catalog.meta(db, s"${name}_codes").getOrElse(
      throw new IllegalArgumentException(s"rebuildPqIndex: no codes set for $db.$name"))
    val encode = pqEncodeUdf(codebooks)
    // Stage BOTH the data rewrite and the model write before touching
    // live state: searches keep reading the consistent old
    // (codebooks, codes) pair for the whole expensive part, and a crash
    // anywhere before the swaps leaves the live index untouched. The
    // swaps then commit as ONE marker group (swapSetGroup): a crash
    // between them no longer leaves new codes under old codebooks — the
    // next rebuild's recoverSwapGroup preamble finishes the whole group
    // before anything else runs.
    catalog.createSet(db, s"${name}_codes_rebuild",
      vecs.select(col("neighbor_id"), encode(col("n_vec")).as("codes")),
      partitionColumn = cm.partitionColumn, numPartitions = cm.numPartitions)
    catalog.markStaging(db, s"${name}_codes_rebuild")
    persistCodebooks(spark, catalog, db, name, codebooks, suffix = "_rebuild")
    swapInStaged(catalog, db,
      Seq(s"${name}_codes", s"${name}_codebooks"))
    persistBuiltRows(spark, catalog, db, name)
  }

  /** IVF-PQ form of [[rebuildPqIndex]]: retrain BOTH standing models
    * (coarse centroids + sub-codebooks, one shared md5-ordered sample —
    * the same sample [[ivfPqTopK]] trains on over this corpus), replace
    * them, and rewrite the bucket-partitioned code set with fresh
    * assignments + codes. One scan of the vectors set; the vectors set
    * itself (hash-placed on id for the re-rank) is untouched.
    */
  def rebuildIvfPqIndex(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String, iters: Int = 2): Unit = {
    recoverStagedSwaps(catalog, db, Seq("codes", "centroids", "codebooks")
      .map(s => s"${name}_$s"))
    val nCentroids = catalog.scanSet(db, s"${name}_centroids").count().toInt
    val old = loadPqCodebooks(catalog, db, name)
    val m = old.length
    val kSub = old(0).length
    val vecs = catalog.scanSet(db, s"${name}_vectors")
    val sample = sampleVectors(vecs, "neighbor_id", "n_vec", 10000)
    val centroids = trainCentroidsFromSample(sample, nCentroids, iters = 3)
    val codebooks = trainPqCodebooksFromSample(sample, m, kSub, iters)
    import spark.implicits._
    val assign = nearestUdf(centroids)
    val encode = pqEncodeUdf(codebooks)
    // Stage the data rewrite AND both model writes before touching live
    // state (rebuildPqIndex's ordering rationale): the expensive
    // re-encode scan runs while searches still see the consistent old
    // (centroids, codebooks, codes) triple; the three swaps then commit
    // as ONE marker group (swapSetGroup), and a crash between any two of
    // them is FINISHED by the next rebuild's recoverSwapGroup preamble
    // (no mixed-generation window; everything staged re-derives
    // from the untouched vectors set).
    catalog.createPartitionedSet(db, s"${name}_codes_rebuild",
      vecs.select(col("neighbor_id"), encode(col("n_vec")).as("codes"),
        assign(col("n_vec")).as("bucket")),
      "bucket")
    catalog.markStaging(db, s"${name}_codes_rebuild")
    catalog.createSet(db, s"${name}_centroids_rebuild",
      centroids.zipWithIndex
        .map { case (v, b) => (b.toLong, v.toSeq) }.toSeq
        .toDF("bucket", "centroid"),
      policy = "none")
    catalog.markStaging(db, s"${name}_centroids_rebuild")
    persistCodebooks(spark, catalog, db, name, codebooks, suffix = "_rebuild")
    swapInStaged(catalog, db, Seq(s"${name}_codes",
      s"${name}_centroids", s"${name}_codebooks"))
    persistBuiltRows(spark, catalog, db, name)
  }

  /** Streaming form of [[appendToIvfPqIndex]] — batching-invariant like
    * its IVF and PQ siblings. */
  def streamAppendToIvfPqIndex(
      stream: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      rebuildIfDrifted: Boolean = false,
      driftFraction: Double = 0.5): Unit = {
    val spark = stream.sparkSession
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        appendToIvfPqIndex(spark, catalog, db, name, batch.toDF(), idCol, vecCol,
          rebuildIfDrifted, driftFraction)
        ()
      }
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Search a persisted IVF-PQ index: load both models (tiny), compute
    * each query's probe buckets and LUTs, join the broadcast probes
    * against the bucket-partitioned CODE set (partition pruning at the
    * directory listing — only probed cells are read, and what is read is
    * codes), ADC-shortlist, then re-rank exactly against the vector set.
    * Identical results to [[ivfPqTopK]] over the same corpus.
    */
  def searchIvfPqIndex(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String, queries: DataFrame, k: Int,
      nprobe: Int = 4, shortlist: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    searchIvfPqWithModels(catalog, db, name, queries, k, nprobe, shortlist,
      idCol, vecCol, loadIvfCentroids(catalog, db, name),
      loadPqCodebooks(catalog, db, name))

  /** [[searchIvfPqIndex]] after its model loads — the per-batch body the
    * streaming probe reuses with generation-cached models (the code and
    * vector sets are re-planned HERE, once per call: that is where
    * appends land).
    */
  private def searchIvfPqWithModels(
      catalog: graft.storage.SetCatalog,
      db: String, name: String, queries: DataFrame, k: Int,
      nprobe: Int, shortlist: Int, idCol: String, vecCol: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val probe = probeUdf(centroids, nprobe)
    val lut = pqLutUdf(codebooks)
    val codes = catalog.scanSet(db, s"${name}_codes")
    val bucketType = codes.schema("bucket").dataType
    val probes = queries.select(col(idCol).as("query_id"),
      explode(probe(col(vecCol))).as("bucket"), lut(col(vecCol)).as("lut"))
      .withColumn("bucket", col("bucket").cast(bucketType))
      .localCheckpoint(eager = true)
    // static cell pruning on the bucket-partitioned code table — the
    // probed cells as literals, deterministic at any query-frame shape
    val short = adcShortlist(
      pruneToTouchedCells(codes, probes).join(broadcast(probes),
        Seq("bucket")), shortlist, k)
    rerankExact(short, catalog.scanSet(db, s"${name}_vectors"), queries, k, idCol, vecCol)
  }

  /** Persist a PQ index into the set catalog: the sub-codebooks as a tiny
    * `<name>_codebooks` set, the 64-bit codes as `<name>_codes` (the
    * compressed scan table — at 100 TB of vectors this is the ~1.5 TB
    * table ADC actually reads), and the full vectors as `<name>_vectors`
    * hash-placed on id (touched only for the shortlist re-rank, an
    * id-equi join). Build once, search many times — the codebooks are
    * retrained only on distribution drift, like the IVF coarse
    * quantizer.
    */
  def buildPqIndex(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String, emb: DataFrame,
      m: Int = 16, kSub: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      numBuckets: Int = 0,
      advisor: Option[graft.advisor.PlacementAdvisor] = None,
      targetRowsPerBucket: Long = 1L << 22,
      knownRowCount: Long = 0L): Unit = {
    val codebooks = trainPqCodebooks(emb, m, kSub, iters, idCol, vecCol,
      knownRowCount = knownRowCount)
    persistCodebooks(spark, catalog, db, name, codebooks)
    // partition-count choice follows the other index builders: explicit,
    // else the advisor's sizing rule over the corpus rowcount, else the
    // same rule without history (PlacementAdvisor.bucketCountFor — the
    // shuffle-partition constant it replaces encoded the local core
    // count into stored layouts). Pass knownRowCount when the caller
    // already paid for a count (e.g. the corpus came off a catalog set
    // whose sidecar carries it) — both auto paths otherwise cost one
    // extra counting pass here, since BOTH output sets need the bucket
    // count before their writes (a bare parquet count is footer-cheap).
    val n = if (numBuckets > 0) numBuckets
      else {
        val rows = if (knownRowCount > 0) knownRowCount else emb.count()
        advisor
          .map(_.recommendBuckets(s"$db.${name}_codes", rows,
            targetRowsPerBucket))
          .getOrElse(graft.advisor.PlacementAdvisor
            .bucketCountFor(rows, targetRowsPerBucket))
      }
    val encode = pqEncodeUdf(codebooks)
    catalog.createSet(db, s"${name}_codes",
      emb.select(col(idCol).as("neighbor_id"), encode(col(vecCol)).as("codes")),
      partitionColumn = Some("neighbor_id"), numPartitions = n)
    catalog.createSet(db, s"${name}_vectors",
      emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
        l2Norm(col(vecCol)).as("n_nrm")),
      partitionColumn = Some("neighbor_id"), numPartitions = n)
    persistBuiltRows(spark, catalog, db, name)
  }

  private def loadPqCodebooks(
      catalog: graft.storage.SetCatalog, db: String,
      name: String): Array[Array[Array[Double]]] =
    catalog.scanSet(db, s"${name}_codebooks")
      .orderBy(col("sub"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._2)).toArray

  /** Bucket-ordered coarse-centroid collect — the model load shared by
    * the append and search paths (the build-time routing threshold is
    * NOT read here: the search probe is the flat [[probeUdf]] over an
    * ANN-scale codebook; persisted-threshold derivation belongs to the
    * assignment paths via [[loadCentroidsWithThreshold]]).
    */
  private def loadIvfCentroids(
      catalog: graft.storage.SetCatalog, db: String,
      name: String): Array[Array[Double]] =
    catalog.scanSet(db, s"${name}_centroids")
      .orderBy(col("bucket")).collect()
      .map(_.getSeq[Double](1).toArray)

  /** Incrementally extend a persisted PQ index: encode the NEW vectors
    * under the standing codebooks and append codes + vectors — no
    * retrain, no rewrite, one scan of the batch. A code depends only on
    * (vector, codebooks), so build(A) + append(B) is byte-identical to a
    * one-pass encode under A's codebooks — the continuous-ingest path.
    */
  def appendToPqIndex(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String, newEmb: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      rebuildIfDrifted: Boolean = false,
      driftFraction: Double = 0.5): Unit = {
    val encode = pqEncodeUdf(loadPqCodebooks(catalog, db, name))
    catalog.appendToSet(db, s"${name}_codes",
      newEmb.select(col(idCol).as("neighbor_id"), encode(col(vecCol)).as("codes")))
    catalog.appendToSet(db, s"${name}_vectors",
      newEmb.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
        l2Norm(col(vecCol)).as("n_nrm")))
    if (rebuildIfDrifted &&
        appendedDriftFraction(catalog, db, name) >= driftFraction)
      rebuildPqIndex(spark, catalog, db, name)
  }

  /** Streaming form of [[appendToPqIndex]]: every micro-batch of
    * arriving embeddings is encoded under the standing codebooks and
    * appended. Batching-invariant by construction, like the IVF
    * streaming append.
    */
  def streamAppendToPqIndex(
      stream: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      rebuildIfDrifted: Boolean = false,
      driftFraction: Double = 0.5): Unit = {
    val spark = stream.sparkSession
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        appendToPqIndex(spark, catalog, db, name, batch.toDF(), idCol, vecCol,
          rebuildIfDrifted, driftFraction)
        ()
      }
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Search a persisted PQ index: load the codebooks (tiny), ADC-scan
    * the standing code table against the broadcast query LUTs, re-rank
    * the shortlist by exact rounded cosine against the vectors set.
    * Identical results to [[pqTopK]] over the same corpus — training,
    * encoding, ADC, and scoring share the same deterministic kernels.
    */
  def searchPqIndex(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String, queries: DataFrame, k: Int,
      shortlist: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    searchPqWithModels(catalog, db, name, queries, k, shortlist, idCol,
      vecCol, loadPqCodebooks(catalog, db, name))

  /** [[searchPqIndex]] after its codebook load — the per-batch body the
    * streaming probe reuses with generation-cached codebooks (the code
    * and vector sets are re-planned HERE, once per call).
    */
  private def searchPqWithModels(
      catalog: graft.storage.SetCatalog,
      db: String, name: String, queries: DataFrame, k: Int,
      shortlist: Int, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val lut = pqLutUdf(codebooks)
    val codes = catalog.scanSet(db, s"${name}_codes")
    val q = queries.select(col(idCol).as("query_id"), lut(col(vecCol)).as("lut"))
    val short = adcShortlist(codes.crossJoin(broadcast(q)), shortlist, k)
    rerankExact(short, catalog.scanSet(db, s"${name}_vectors"), queries, k, idCol, vecCol)
  }

  /** Search a persisted IVF index: load the codebook (tiny), compute each
    * query's `nprobe` buckets, and join the broadcast probes against the
    * partitioned vector set — the bucket is the partition directory, so
    * the scan lists only probed buckets (dynamic partition pruning from
    * the broadcast). Results are identical to [[ivfTopK]] over the same
    * corpus because codebook training, assignment, probing, and scoring
    * share the same deterministic kernels.
    */
  def searchIvfIndex(
      spark: SparkSession, catalog: graft.storage.SetCatalog,
      db: String, name: String, queries: DataFrame, k: Int,
      nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    searchIvfWithModels(catalog, db, name, queries, k, nprobe, idCol, vecCol,
      loadIvfCentroids(catalog, db, name))

  /** [[searchIvfIndex]] after its codebook load — the per-batch body the
    * streaming probe reuses with a generation-cached codebook (the
    * vector set is re-planned HERE, once per call).
    */
  private def searchIvfWithModels(
      catalog: graft.storage.SetCatalog,
      db: String, name: String, queries: DataFrame, k: Int,
      nprobe: Int, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val probe = probeUdf(centroids, nprobe)
    val vectors = catalog.scanSet(db, s"${name}_vectors")
    // partition-column type follows Hive directory inference (int), not
    // the written long — cast the probe side to whatever came back
    val bucketType = vectors.schema("bucket").dataType
    // materialized once: the probe side is |queries|·nprobe rows and is
    // read twice (touched-cell collect + broadcast join)
    val probes = withCellGroup(vectors,
      queries.select(col(idCol).as("query_id"),
        col(vecCol).as("q_vec"), l2Norm(col(vecCol)).as("q_nrm"),
        explode(probe(col(vecCol))).as("bucket"))
        .withColumn("bucket", col("bucket").cast(bucketType)))
      .localCheckpoint(eager = true)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    // STATIC cell pruning (see pruneToTouchedCells): deterministic
    // listing-level pruning for any query-frame shape — DPP declines on
    // local/RDD-backed query frames and is redundant after this
    pruneToTouchedCells(vectors, probes).join(broadcast(probes),
        cellJoinKeys(vectors))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  // --------------------------------------------------------------------
  // Streaming SEARCH of the persisted index family — the production
  // retrieval shape: a standing pipeline continuously querying a
  // maintained ANN index (reference analogue: the standing top-k
  // similarity workloads, src/tpchBench/headers/TopJaccard.h:17). Each
  // micro-batch of arriving QUERY vectors is searched against the
  // index's CURRENT generation — the LIVE-INDEX contract every stored-
  // index probe stream shares (see Dedup.streamSemanticAgainstIndex):
  // the code/vector sets are re-planned inside the batch closure, so an
  // append landing mid-stream is visible to every later batch and a
  // rebuild swap is survived; the driver-side models (coarse centroids,
  // PQ codebooks — O(k·d) collects) are generation-cached on the
  // sidecars' explicit counters and re-collected exactly when a
  // maintenance pass swapped a new generation in.
  // --------------------------------------------------------------------

  /** Per-batch search closure of [[streamSearchIvfPqIndex]], plus its
    * model-collect counter (the observable the cache spec pins). Models
    * reload when EITHER sidecar generation moves — an IVF-PQ rebuild
    * swaps centroids and codebooks as one marker group, but the cache
    * must not trust that coupling.
    */
  private[graft] def ivfPqSearchProbeFnCounted(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      k: Int, nprobe: Int = 4, shortlist: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame => DataFrame, () => Int) = {
    var cached: Option[(Long, Long,
      Array[Array[Double]], Array[Array[Array[Double]]])] = None
    var loadCount = 0
    val fn = (batch: DataFrame) => {
      val sc = catalog.metaStamp(db, s"${name}_centroids")
      val sb = catalog.metaStamp(db, s"${name}_codebooks")
      val (centroids, codebooks) = cached match {
        case Some((c0, b0, ce, cb))
            if c0 == sc && b0 == sb && sc != 0L && sb != 0L => (ce, cb)
        case _ =>
          val ce = loadIvfCentroids(catalog, db, name)
          val cb = loadPqCodebooks(catalog, db, name)
          cached = Some((sc, sb, ce, cb))
          loadCount += 1
          (ce, cb)
      }
      searchIvfPqWithModels(catalog, db, name, batch, k, nprobe, shortlist,
        idCol, vecCol, centroids, codebooks)
    }
    (fn, () => loadCount)
  }

  private[graft] def ivfPqSearchProbeFn(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      k: Int, nprobe: Int = 4, shortlist: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame => DataFrame =
    ivfPqSearchProbeFnCounted(catalog, db, name, k, nprobe, shortlist,
      idCol, vecCol)._1

  /** Streaming search of a persisted IVF-PQ index: every micro-batch of
    * arriving query vectors returns its top-k over the index's CURRENT
    * generation — identical per batch to [[searchIvfPqIndex]] at that
    * generation (batching-invariant: a query's result depends only on
    * (query, index generation)). With `sink`, per-batch hits APPEND to a
    * stored set (the production form); without, the accumulated hits
    * return when the stream drains (the oracle-query form).
    */
  def streamSearchIvfPqIndex(
      stream: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, k: Int,
      nprobe: Int = 4, shortlist: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      sink: Option[(graft.storage.SetCatalog, String, String)] = None): DataFrame =
    graft.operators.Dedup.streamProbe(stream,
      ivfPqSearchProbeFn(catalog, db, name, k, nprobe, shortlist,
        idCol, vecCol), sink)

  /** Per-batch search closure of [[streamSearchIvfIndex]] + collect
    * counter. */
  private[graft] def ivfSearchProbeFnCounted(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      k: Int, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame => DataFrame, () => Int) = {
    var cached: Option[(Long, Array[Array[Double]])] = None
    var loadCount = 0
    val fn = (batch: DataFrame) => {
      val sc = catalog.metaStamp(db, s"${name}_centroids")
      val centroids = cached match {
        case Some((c0, ce)) if c0 == sc && sc != 0L => ce
        case _ =>
          val ce = loadIvfCentroids(catalog, db, name)
          cached = Some((sc, ce))
          loadCount += 1
          ce
      }
      searchIvfWithModels(catalog, db, name, batch, k, nprobe, idCol,
        vecCol, centroids)
    }
    (fn, () => loadCount)
  }

  /** Streaming search of a persisted IVF index — [[searchIvfIndex]] per
    * micro-batch under the live-index contract.
    */
  def streamSearchIvfIndex(
      stream: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, k: Int, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      sink: Option[(graft.storage.SetCatalog, String, String)] = None): DataFrame =
    graft.operators.Dedup.streamProbe(stream,
      ivfSearchProbeFnCounted(catalog, db, name, k, nprobe, idCol,
        vecCol)._1, sink)

  /** Per-batch search closure of [[streamSearchPqIndex]] + collect
    * counter. */
  private[graft] def pqSearchProbeFnCounted(
      catalog: graft.storage.SetCatalog, db: String, name: String,
      k: Int, shortlist: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame => DataFrame, () => Int) = {
    var cached: Option[(Long, Array[Array[Array[Double]]])] = None
    var loadCount = 0
    val fn = (batch: DataFrame) => {
      val sb = catalog.metaStamp(db, s"${name}_codebooks")
      val codebooks = cached match {
        case Some((b0, cb)) if b0 == sb && sb != 0L => cb
        case _ =>
          val cb = loadPqCodebooks(catalog, db, name)
          cached = Some((sb, cb))
          loadCount += 1
          cb
      }
      searchPqWithModels(catalog, db, name, batch, k, shortlist, idCol,
        vecCol, codebooks)
    }
    (fn, () => loadCount)
  }

  /** Streaming search of a persisted PQ index — [[searchPqIndex]] per
    * micro-batch under the live-index contract.
    */
  def streamSearchPqIndex(
      stream: DataFrame, catalog: graft.storage.SetCatalog,
      db: String, name: String, k: Int, shortlist: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      sink: Option[(graft.storage.SetCatalog, String, String)] = None): DataFrame =
    graft.operators.Dedup.streamProbe(stream,
      pqSearchProbeFnCounted(catalog, db, name, k, shortlist, idCol,
        vecCol)._1, sink)
}
