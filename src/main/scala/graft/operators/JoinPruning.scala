package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-pruned semi join: probe-side rows are pre-filtered through a
  * Bloom filter built from the build side's keys BEFORE the exact join,
  * so at 100 TB the shuffle carries only probable matches instead of the
  * whole probe table. The result is EXACTLY the plain semi join — the
  * Bloom pass admits false positives, and the hash join after it removes
  * them — so correctness never depends on the sketch.
  *
  * This is the explicit, tunable form of what Spark's runtime row-group
  * filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects
  * for selective shuffle joins, built from the same Catalyst pieces:
  * `BloomFilterAggregate` over `xxhash64(key)` on the build side and the
  * codegen'd `BloomFilterMightContain` predicate on the probe side.
  * Hashing through `xxhash64` first makes the filter type-generic — any
  * atomic key type (long, string, binary, decimal, date) hashes to the
  * same LongType domain on both sides, so there is no per-type dispatch
  * and no representation mismatch between build and probe.
  *
  * Scale notes: the filter is built with one partial-aggregated pass over
  * the build side's keys (no driver-size issue beyond the bitset itself)
  * and embedded in the probe plan as a binary literal — the same shape the
  * optimizer's injected runtime filter uses (there via a reused scalar
  * subquery); fpp 1% at 10M keys is ~12 MB. The probe-side test is a
  * plan-local bit probe per row inside whole-stage codegen.
  */
object JoinPruning {

  def bloomSemiJoin(
      probe: DataFrame, build: DataFrame, key: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val numBits =
      org.apache.spark.util.sketch.BloomFilter.create(expectedKeys, fpp).bitSize()
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(key))),
      Literal(expectedKeys), Literal(numBits)).toAggregateExpression()
    val bfBytes = build.select(ColumnBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bfBytes, BinaryType),
      ColumnBridge.expression(xxhash64(col(key)))))
    probe.filter(mightContain)
      .join(build.select(col(key)), Seq(key), "left_semi")
  }
}
