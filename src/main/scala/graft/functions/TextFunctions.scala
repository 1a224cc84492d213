package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression building blocks for the training-data pipeline
  * operators (dedup, similarity, text analysis). Everything here stays
  * inside Catalyst higher-order functions — codegen'd, no UDFs — so the
  * hot path survives whole-stage codegen at 100 TB.
  */
object TextFunctions {

  /** whitespace tokenization (the fixture corpus is single-space separated) */
  def tokens(text: Column): Column = split(text, " ")

  /** distinct word set, for set-jaccard / minhash */
  def wordSet(text: Column): Column = array_distinct(tokens(text))

  /** word n-gram shingles (order-sensitive): contiguous n-word windows,
    * distinct. Delegates to the codegen'd [[WordShingles]] expression —
    * the nested-HOF form (`transform(sequence, i => concat_ws(slice(...)))`)
    * runs interpreted and re-evaluates the token split per element.
    */
  def wordShingles(text: Column, n: Int): Column =
    ShingleExpressions.wordShinglesNative(text, n)

  /** character n-gram shingles, distinct */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(text) - (n - 1), lit(0))),
        i => text.substr(i, lit(n))))

  /** exact set jaccard = |a∩b| / (|a|+|b|-|a∩b|), as double.
    * Computed from integer sizes so the division is bit-deterministic
    * across engines.
    */
  def jaccard(a: Column, b: Column): Column = {
    // single shared intersect subtree — whole-stage codegen's subexpression
    // elimination evaluates it once per row
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter).cast("double")
  }

  /** MinHash signature via nested higher-order functions.
    *
    * NOTE: prefer [[graft.functions.MinHashAgg.minhashSig]] (the
    * TypedImperativeAggregate over exploded shingles) in real plans —
    * nested ArrayTransform runs interpreted and re-evaluates the captured
    * shingle subtree per seed, a ~k× per-row blowup. This form is kept as
    * the one-expression variant for small inputs.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, s))))

  /** LSH band keys: hash r consecutive signature slots per band; a pair
    * collides if any band key matches. Returns array of (band, key) structs
    * for explode + shuffle-join on the key.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(b, slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).as("bkey")))

  /** dot product of two float-array embeddings in double, sequential
    * left-to-right accumulation — matches an engine summing the unnested
    * elements in index order, so results are bit-identical to the oracle.
    * Delegates to the codegen'd [[VectorExpressions.dotNative]] (single
    * fused loop, no intermediate array — unlike aggregate(zip_with(...))).
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotNative(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))
}
