package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketized) range join — the scale-safe plan for joining points
  * to intervals. The reference engine has no range join at all (its only
  * join paths are hash-equi and cartesian —
  * reference: src/lambdas/headers/JoinComp.h, CPlusPlusLambda.h:315); a
  * naive Spark translation of `a.value BETWEEN b.lo AND b.hi` is a
  * broadcast-nested-loop / cartesian plan that dies at scale.
  *
  * Banding turns it into an equi-join: pick a band width `w`, replicate
  * each interval onto every band it overlaps, put each point in its own
  * band (`floor(v/w)`), hash-join on the band id, and re-check the exact
  * range as a residual predicate. Each qualifying (point, interval) pair
  * meets in EXACTLY one band — the point's — so no post-join distinct is
  * needed. Cost: |intervals| × avg(span/w) replication vs a full cartesian;
  * pick `w` near the typical interval span so replication stays O(1) per
  * interval while band buckets stay selective.
  */
object RangeJoin {

  /** Join points to half-open intervals [lo, hi).
    *
    * @param points    left side; `pointCol` is the numeric probe value
    * @param intervals right side; `loCol`/`hiCol` bound the interval
    * @param bandWidth band size in the value's units (≈ typical span)
    */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bandWidth: Double): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val p = points.withColumn("__band",
      floor(col(pointCol) / bandWidth).cast("long"))
    // interval [lo, hi) overlaps bands floor(lo/w) .. ceil(hi/w)-1
    // (hi exactly on a band edge contributes nothing to that band)
    val i = intervals.withColumn("__band",
      explode(sequence(
        floor(col(loCol) / bandWidth).cast("long"),
        greatest(
          (ceil(col(hiCol) / bandWidth) - 1).cast("long"),
          floor(col(loCol) / bandWidth).cast("long")))))
    p.join(i, Seq("__band"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__band")
  }
}
