package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ZOrderExpressions.zValue

/** Multi-dimensional data layout — the Spark-world continuation of the
  * reference's thesis that PLACEMENT, not operator code, decides scan
  * cost (Lachesis chooses partition lambdas per workload; reference:
  * src/selfLearning/headers/RuleBasedDataPlacementOptimizerForLoadJob.h).
  * A single-column sort clusters one predicate dimension; z-order
  * clustering lets parquet min/max footer stats prune TWO-dimensional
  * range predicates from the file listing itself.
  */
object Layout {

  /** Cluster `df` on the z-curve of two integral dimensions:
    * range-repartition by z-value (so partition z-ranges are disjoint)
    * and sort inside each partition (so row groups within a file cover
    * compact z-intervals). Written out, each file's (x, y) min/max spans
    * a small rectangle instead of the whole domain — a 2-D box predicate
    * then touches only the files whose rectangle intersects it.
    */
  def zorderCluster(
      df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int): DataFrame =
    df.withColumn("__z",
        zValue(col(xCol).cast("long"), col(yCol).cast("long")))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** 2-D box filter with an explicit z-interval pre-filter. For any box,
    * every contained point's z-value lies in
    * [z(xLo,yLo), z(xHi,yHi)] (the curve enters the box at its min
    * corner and leaves at its max corner), so the z-BETWEEN is a valid
    * superset — on a z-clustered table it is the predicate the scan
    * prunes files/row-groups with — and the exact per-dimension bounds
    * then cut the curve's excursions outside the box.
    *
    * The superset argument needs every in-box coordinate to interleave
    * exactly, and [[ZOrderKernel.interleave]] keeps only the low 31 bits
    * — so the z pre-filter applies only when all four bounds sit in
    * [0, 2^31) (then any row matching the exact box is in-range too).
    * Boxes reaching outside that domain keep only the exact predicate:
    * still correct, just without footer-stats pruning.
    */
  def zBoxFilter(
      df: DataFrame, xCol: String, yCol: String,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    val zMax = 1L << 31
    val inZDomain = Seq(xLo, xHi, yLo, yHi).forall(v => v >= 0 && v < zMax)
    val pre =
      if (!inZDomain) df
      else {
        val z = zValue(col(xCol).cast("long"), col(yCol).cast("long"))
        df.filter(z.between(
          graft.functions.ZOrderKernel.interleave(xLo, yLo),
          graft.functions.ZOrderKernel.interleave(xHi, yHi)))
      }
    pre.filter(col(xCol).between(xLo, xHi) && col(yCol).between(yLo, yHi))
  }
}
