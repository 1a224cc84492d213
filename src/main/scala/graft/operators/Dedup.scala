package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for large-scale corpus curation. The reference
  * engine has no dedup operator (distinct is a group-by with the value
  * ignored — reference: src/sharedLibraries/headers/DistinctProjection.h);
  * these extend the capability surface for training-data pipelines.
  *
  * Scale design: every op is a shuffle-on-key plan. Exact dedup shuffles on
  * the content hash; MinHash/SimHash shuffle on band keys (candidate pairs
  * only — never O(n²)); the brute-force pair verifiers run only on the
  * LSH-pruned candidate set.
  */
object Dedup {

  /** Exact dedup by content hash-groupBy: one row per distinct key with the
    * kept (min) id and the duplicate count. At scale this is a single
    * shuffle on xxhash64(key) with partial aggregation map-side.
    */
  def exact(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(xxhash64(key).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"))

  /** MinHash + LSH near-dup pairs.
    *
    * shingle → k-wide minhash signature → b bands of r slots → explode bands
    * → self-join on (band, bandkey) → distinct candidate pairs → verify with
    * exact set-jaccard ≥ threshold.
    *
    * With b=64, r=2 the probability of *missing* a pair at jaccard 0.8 is
    * (1-0.8²)^64 ≈ 1e-28, so against an exact oracle the result is
    * deterministic; false candidates are removed by the verify step.
    * The band join shuffles candidates only — never materializing O(n²).
    */
  def minhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, k: Int = 128, bands: Int = 64): DataFrame = {
    val r = k / bands
    val withSets = docs.select(
      col(idCol).as("id"), wordSet(col(textCol)).as("ws"))
    val banded = withSets
      .withColumn("sig", minhashSignature(col("ws"), k))
      .select(col("id"), col("ws"), explode(lshBands(col("sig"), bands, r)).as("bk"))
      .select(col("id"), col("ws"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = banded.select(col("band"), col("bkey"),
      col("id").as("id_a"), col("ws").as("ws_a"))
    val b = banded.select(col("band"), col("bkey"),
      col("id").as("id_b"), col("ws").as("ws_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ws_a"), col("ws_b"))
      .distinct()
      .filter(jaccard(col("ws_a"), col("ws_b")) >= threshold)
      .select(col("id_a"), col("id_b"),
        jaccard(col("ws_a"), col("ws_b")).as("jaccard"))
  }

  /** N-gram (word shingle) jaccard near-dup pairs — order-sensitive variant.
    * Same LSH pruning as [[minhashPairs]], verified with exact shingle
    * jaccard.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 3,
      threshold: Double = 0.5, k: Int = 128, bands: Int = 64): DataFrame = {
    val r = k / bands
    val withSh = docs.select(
      col(idCol).as("id"), wordShingles(col(textCol), n).as("sh"))
    val banded = withSh
      .withColumn("sig", minhashSignature(col("sh"), k))
      .select(col("id"), col("sh"), explode(lshBands(col("sig"), bands, r)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = banded.select(col("band"), col("bkey"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bkey"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .filter(jaccard(col("sh_a"), col("sh_b")) >= threshold)
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  /** SimHash near-dup: 64-bit signature whose bits are the sign of the
    * per-bit-position vote over token hashes; near-dups = small Hamming
    * distance. Banded into 16-bit quarters for the candidate join
    * (hamming ≤ 3 ⇒ at least one identical quarter, pigeonhole).
    */
  val simhash64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (words: Seq[String]) =>
      val votes = new Array[Int](64)
      words.foreach { w =>
        // two 32-bit murmur seeds → one deterministic 64-bit word hash
        val h = (scala.util.hashing.MurmurHash3.stringHash(w, 0xcafe).toLong << 32) |
          (scala.util.hashing.MurmurHash3.stringHash(w, 0xbeef).toLong & 0xffffffffL)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      var out = 0L
      var i = 0
      while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
      out
    }

  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      simhash64(wordSet(col(textCol))).as("sh"))
    val banded = sh.select(col("id"), col("sh"),
      explode(array((0 until 4).map(q => struct(lit(q).as("q"),
        shiftrightunsigned(col("sh"), q * 16)
          .bitwiseAND(lit(0xffffL)).as("qv"))): _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.q").as("q"), col("bk.qv").as("qv"))
    val a = banded.select(col("q"), col("qv"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("q"), col("qv"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("q", "qv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding cosine near-dup pairs. Brute-force all-pairs baseline —
    * correct at any scale but O(n²); the scale path is
    * [[SimilaritySearch.ivfTopK]]-style bucketing.
    */
  def cosinePairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      // rounded to 1e-6: keeps the threshold compare independent of
      // summation-order noise in the last float bits
      .withColumn("cos", round(cosine(col("v_a"), col("v_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
