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
  */
object Parallelism {

  def ensureWidth(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
