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
}
