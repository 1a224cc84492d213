package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for pipeline curation. Both key off
  * the shared Rabin-Karp hash ([[graft.functions.HashKernel]]) instead of
  * `rand()`/`TABLESAMPLE`, so a rerun of the job yields the SAME sample
  * and a SQL oracle can reproduce the exact row set.
  */
object Sampling {

  /** Up to `k` rows per stratum, chosen by the md5 of the row id — a
    * pseudo-random but reproducible per-stratum order (`id` as tiebreak).
    * md5, NOT the Rabin-Karp rolling hash: a base-257 polynomial of a
    * short decimal string never wraps the 2⁶¹−1 modulus, so it is
    * ORDER-PRESERVING on small numeric ids — "hash order" would silently
    * equal id order. md5 mixes properly and both engines produce the
    * identical hex string, so the oracle reproduces the exact row set.
    * One windowed rank per stratum; the sort is per-stratum and spills,
    * so heavy strata are safe — for extreme k·strata skew the
    * bounded-heap [[TopKAggregator]] per key gives the same semantics
    * with k-bounded memory.
    */
  def stratified(df: DataFrame, stratum: Column, id: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(md5(id.cast("string").cast("binary")), id)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Corpus mixing by target weights — the "data mixing" step of a
    * pretraining pipeline (rebalance languages/sources to target
    * proportions before tokenization). Each stratum g gets quota
    * ⌊w_g/Σw × total⌋ rows, chosen in the same reproducible md5 order as
    * [[stratified]]; strata missing from `weights` contribute nothing,
    * and a stratum shorter than its quota contributes all it has (the
    * standard under-sampled-language behavior — upsampling/repetition is
    * a policy decision left to the caller). One windowed rank per
    * stratum, same spill/scale shape as [[stratified]].
    */
  def mixByWeights(
      df: DataFrame, stratum: Column, id: Column,
      weights: Map[String, Double], total: Int): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixByWeights needs positive stratum weights")
    val sum = weights.values.sum
    val quota = weights.foldLeft(lit(0L)) { case (acc, (g, w)) =>
      when(stratum === g, lit(math.floor(w / sum * total).toLong))
        .otherwise(acc)
    }
    val win = Window.partitionBy(stratum)
      .orderBy(md5(id.cast("string").cast("binary")), id)
    df.withColumn("__q", quota)
      .withColumn("__rk", row_number().over(win))
      .filter(col("__rk") <= col("__q"))
      .drop("__q", "__rk")
  }

  /** Weighted sample without replacement, k rows, inclusion probability
    * proportional to `weight` — Efraimidis–Spirakis A-ES: each row gets
    * key ln(u)/w for a uniform u and the k LARGEST keys win. u is
    * md5-derived (top 15 hex digits / 2⁶⁰) instead of `rand()`, so the
    * sample is rerun-stable and a SQL oracle reproduces the exact row
    * set. One map pass + a global top-k (TakeOrderedAndProject — each
    * partition keeps k, driver merges k·partitions); no full sort, no
    * window over the whole table, scale-safe at any row count.
    */
  def weightedSample(
      df: DataFrame, id: Column, weight: Column, k: Int): DataFrame = {
    val u = conv(substring(md5(id.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("double") / lit(math.pow(2.0, 60))
    df.withColumn("__key", log(u) / weight)
      .orderBy(col("__key").desc, id)
      .limit(k)
      .drop("__key")
  }
}
