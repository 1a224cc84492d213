package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over event streams — funnel conversion and
  * cohort retention, the two classic product-analytics operators the
  * reference's clients would build from SelectionComp + AggregateComp
  * chains (SURVEY.md §2.1); here each is a fixed number of key-local
  * aggregations, no per-user sequence materialization.
  */
object EventAnalytics {

  /** Ordered funnel: for stages (s₁, s₂, …), a user reaches stage i when
    * an event of type sᵢ occurs STRICTLY AFTER their stage-(i−1)
    * timestamp (first-touch semantics: each stage binds to the earliest
    * qualifying event). Returns one row per stage with the user count.
    *
    * Scale: stage i is one filtered groupBy(user) min-aggregate plus one
    * equi-join with the stage-(i−1) frame — all shuffles are on the user
    * key, map-side partial min applies, and no collect_list of a user's
    * whole history is ever built (the naive sequence-match formulation
    * buffers unboundedly for hot users). Stage frames only shrink, so
    * later joins broadcast under AQE when the funnel narrows.
    */
  def funnel(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    // each stage frame is checkpointed so it computes ONCE: it feeds
    // both its own count and the next stage's join (the stage boundary
    // is a driver action anyway, mirroring the reference's client-side
    // iteration — SURVEY.md §2.6)
    var reached: DataFrame = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__t"))
      .localCheckpoint(true)
    var counts = Vector((1, stages.head, reached.count()))
    for ((s, i) <- stages.zipWithIndex.drop(1)) {
      reached = events.filter(col(typeCol) === s)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
        .join(reached, Seq("__u"))
        .filter(col("__ts") > col("__t"))
        .groupBy(col("__u"))
        .agg(min(col("__ts")).as("__t"))
        .localCheckpoint(true)
      counts :+= ((i + 1, s, reached.count()))
    }
    counts.toDF("stage", "event_type", "users")
  }

  /** Weekly cohort retention: users are cohorted by the epoch week of
    * their FIRST event; output is (cohort_week, week_offset, users) —
    * how many of each cohort were active again k weeks later. Weeks are
    * integer epoch-week indices (⌊epoch_seconds/604800⌋), not calendar
    * truncations, so the math is timezone-free and engine-exact.
    *
    * Scale: distinct (user, week) first (map-side combine collapses a
    * user's events within a week before any shuffle), then one min per
    * user and one count per (cohort, offset) cell — the output is
    * O(cohorts × horizon), tiny at any corpus size.
    */
  def retention(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val week = floor(col(tsCol).cast("long") / 604800L).cast("long")
    val uw = events.select(col(userCol).as("__u"), week.as("__w")).distinct()
    val cohort = uw.groupBy(col("__u")).agg(min(col("__w")).as("__c"))
    uw.join(cohort, Seq("__u"))
      .groupBy(col("__c").as("cohort_week"),
        (col("__w") - col("__c")).as("week_offset"))
      // uw is distinct per (user, week), so a plain count IS the
      // distinct-user count — no count_distinct shuffle needed
      .agg(count(lit(1)).as("users"))
  }
}
