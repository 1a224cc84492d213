package graft.operators

import org.apache.spark.sql.DataFrame

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
  * Call-site contract: pass RAW SCANS (or cheap projections of scans).
  * The width probe compiles `df.rdd`, which (a) builds a separate
  * non-adaptive physical plan — cheap for a scan, wasteful for a deep
  * plan — and (b) under AQE reports the NON-adaptive partition count, so
  * for post-shuffle inputs the check can misjudge the true runtime width.
  * Every current call site passes a scan, where both caveats are moot.
  */
object Parallelism {

  def ensureWidth(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
