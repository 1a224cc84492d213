package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned semi join: probe-side rows are pre-filtered through a
  * Bloom filter built from the build side's keys BEFORE the exact join,
  * so at 100 TB the shuffle carries only probable matches instead of the
  * whole probe table. The result is EXACTLY the plain semi join — the
  * Bloom pass admits false positives, and the hash join after it removes
  * them — so correctness never depends on the sketch.
  *
  * This is the explicit, tunable form of what Spark's runtime row-group
  * filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects
  * for selective shuffle joins: here the caller controls expected item
  * count and false-positive rate, and the filter applies at the scan (so
  * it prunes BEFORE the exchange even when the optimizer would not).
  *
  * Scale notes: the filter is built with one aggregation over the build
  * side's key column (`DataFrameStatFunctions.bloomFilter` — a tree
  * aggregate, no driver-size issue beyond the bitset itself) and shipped
  * once per executor as a broadcast variable; fpp 1% at 10M keys is
  * ~12 MB. The probe-side test is a broadcast-local bit probe per row.
  */
object JoinPruning {

  def bloomSemiJoin(
      probe: DataFrame, build: DataFrame, key: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val spark = probe.sparkSession
    val bf = build.stat.bloomFilter(key, expectedKeys, fpp)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfB.value.mightContainLong(k))
    probe.filter(mightContain(col(key)))
      .join(build.select(col(key)), Seq(key), "left_semi")
  }
}
