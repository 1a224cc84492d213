package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, Window}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Width guard for compute-heavy per-row stages (interpreted shingle
  * transforms, UDF hashing, brute-force pair loops).
  *
  * A small corpus arrives as one parquet file → ONE scan partition, which
  * serializes the whole stage on a single core (measured: 13s → 2s on the
  * LSH fixtures). A 100 TB corpus, by contrast, is already thousands of
  * partitions — an unconditional repartition there would shuffle the full
  * text payload for nothing. So: widen only when the input is narrower
  * than the session's shuffle parallelism.
  *
  * The width probe reads the relations' FILE STATISTICS from the logical
  * plan (`BaseRelation.sizeInBytes`, summed over scan leaves — the same
  * totals the file-source planner packs splits from, at
  * `spark.sql.files.maxPartitionBytes` bytes per split): no second
  * physical plan is compiled and nothing depends on AQE state — the
  * probe that preceded this one (`df.rdd.getNumPartitions`) compiled a
  * whole non-adaptive physical plan per call. The estimator is only
  * meaningful for scan-shaped input (scans, projections/filters/
  * explodes/unions of scans), so the call-site contract is now
  * structural: a plan containing a join, aggregate, or window throws
  * instead of silently misjudging the post-shuffle width. Inputs with no
  * file leaf at all (streaming micro batches arriving through
  * foreachBatch, driver-local test frames) have no file statistics and
  * are by nature small — they widen unconditionally, the same decision
  * the old partition-count probe made for them.
  */
object Parallelism {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.Parallelism")

  def ensureWidth(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val target = conf.numShufflePartitions
    val plan = df.queryExecution.analyzed
    val derived = plan.exists {
      case _: Join | _: Aggregate | _: Window => true
      case _ => false
    }
    if (derived) {
      // Derived (joined/aggregated/windowed) input is a legitimate call —
      // docs enriched via a metadata join, a pre-aggregated corpus — and
      // its width is already set by the shuffle those operators performed
      // (conf.numShufflePartitions, or AQE's coalesced choice). The file
      // statistics probe below would misjudge such a plan, so pass it
      // through untouched; the hard throw stays available behind a strict
      // flag for callers who want the scan-only contract enforced.
      if (df.sparkSession.conf
          .get("spark.graft.parallelism.strict", "false").toBoolean)
        throw new IllegalArgumentException(
          "ensureWidth(strict): pass scans (or cheap projections/filters/" +
            s"unions of scans), not a joined/aggregated plan — got:\n" +
            plan.treeString)
      log.warn("ensureWidth: derived (join/aggregate/window) input — " +
        "skipping the width probe; width is set by the upstream shuffle")
      return df
    }
    val scanBytes = plan.collectLeaves().collect {
      case lr: LogicalRelation => lr.relation.sizeInBytes
      case r: DataSourceV2Relation => r.computeStats().sizeInBytes.toLong
    }
    if (scanBytes.isEmpty) df.repartition(target)
    else {
      val maxSplit = conf.filesMaxPartitionBytes
      val estWidth = math.max(1L, (scanBytes.sum + maxSplit - 1) / maxSplit)
      if (estWidth >= target) df else df.repartition(target)
    }
  }
}
