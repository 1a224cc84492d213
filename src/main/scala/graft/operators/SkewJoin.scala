package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handles most cases at
  * runtime; explicit salting is the deterministic fallback when one side's
  * key distribution is pathological (a handful of keys holding most rows):
  * the skewed (large) side spreads each key across `salt` sub-partitions
  * via a deterministic row hash; the other side is replicated `salt`-fold.
  * Result equality with the plain join is guaranteed for inner and
  * left-side join types; the shuffle's largest partition shrinks by
  * ~`salt`×.
  *
  * right/full outer are rejected: the replicated `other` side would emit
  * each unmatched right row once per salt value (and null-padded rows for
  * matched keys in salts without a left partner).
  */
object SkewJoin {

  private val supported =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")

  def saltedEquiJoin(
      skewed: DataFrame, other: DataFrame, skewedKey: String,
      otherKey: String, salt: Int, joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "") match {
      case "semi" => "leftsemi" // Spark's bare aliases are salt-safe too
      case "anti" => "leftanti"
      case other  => other
    }
    require(supported.contains(jt),
      s"saltedEquiJoin supports inner/left/semi/anti, not '$joinType' — " +
        "salt the other side (it is the replicated one) instead")
    // deterministic spread: hash of the whole skewed row, not rand(), so
    // plans are replayable and results stable under retries
    val saltCol = pmod(
      xxhash64(skewed.columns.map(skewed(_)).toIndexedSeq: _*), lit(salt))
    val l = skewed.withColumn("__salt", saltCol)
    val r = other
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    l.join(r, l(skewedKey) === r(otherKey) && l("__salt") === r("__salt"), joinType)
      .drop("__salt")
  }
}
