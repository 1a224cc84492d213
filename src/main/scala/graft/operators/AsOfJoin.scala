package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — an operator the reference engine lacks
  * entirely (its only joins are hash-equi and cartesian,
  * src/lambdas/headers/JoinComp.h). For each left row, attach the latest
  * right row with rightTime ≤ leftTime within the same key.
  *
  * Implementation is the union-tag-window composition (preference (a):
  * built-in operators express the semantics, so no custom SparkPlan is
  * warranted): union both sides tagged, one shuffle on the key, one
  * ordered window pass carrying the last right row forward. O(n log n) per
  * key group, single exchange — survives scale-up unlike a range
  * cross-join.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its latest row ≤ left time attaches)
    * @param key       equi key column name (present on both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param rightCols columns of `right` to carry (renamed as given)
    * @return left rows (inner: only those with a match) + carried columns
    */
  def asof(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightCols: Map[String, String]): DataFrame = {
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val carried = rightCols.keys.toSeq
    // all carried columns travel as ONE struct, so the window's
    // last(ignoreNulls) carries a whole right row — never a mix of values
    // from different right rows when some carried column is NULL (and a
    // match whose fields happen to be NULL still counts as a match)
    val r = right.select(col(key), col(rightTime).as("__t"),
      lit(0).as("__side"),
      struct(carried.map(c => col(c).as(c)): _*).as("__carry"))
    val lAll = l.select(
      (l.columns.filterNot(Set("__t", "__side")).map(col).toSeq ++
        Seq(col("__t"), col("__side"),
          lit(null).cast(r.schema("__carry").dataType).as("__carry"))): _*)
    val rAll = r.select(
      (left.columns.filterNot(_ == key)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)).toSeq ++
        Seq(col(key)) ++ Seq(col("__t"), col("__side"), col("__carry"))): _*)
    // same column ORDER on both sides for the union
    val cols = lAll.columns
    val unioned = lAll.select(cols.map(col).toIndexedSeq: _*)
      .unionByName(rAll.select(cols.map(col).toIndexedSeq: _*))
    // right rows sort before left rows at equal time (side 0 < 1), so a
    // right row at exactly leftTime is visible to that left row
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = unioned
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__carry").isNotNull)
    out.select(
      (left.columns.map(col).toSeq ++
        // getField, not col("__carry.c"): a dotted/special-char right
        // column name must resolve as a literal struct field, not a path
        carried.map(c => col("__carry").getField(c).as(rightCols(c)))): _*)
  }
}
