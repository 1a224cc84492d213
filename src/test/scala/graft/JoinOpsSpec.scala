package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.{AsOfJoin, SkewJoin}

class JoinOpsSpec extends GraftSpecBase {

  private def ts(min: Long) = new Timestamp(1704067200000L + min * 60000L)

  test("as-of join picks the latest right row at or before each left time") {
    import spark.implicits._
    val quotes = Seq( // key, time, px
      (1L, ts(0), 100.0), (1L, ts(10), 101.0), (1L, ts(20), 102.0),
      (2L, ts(5), 50.0)).toDF("k", "qt", "px")
    val trades = Seq(
      (1L, ts(10), "at-quote"),  // exactly at a quote → that quote
      (1L, ts(15), "between"),   // between 10 and 20 → quote@10
      (1L, ts(25), "after-all"), // after all → quote@20
      (2L, ts(1), "no-prior"),   // before any quote of key 2 → dropped
      (3L, ts(9), "no-key"))     // key with no quotes → dropped
      .toDF("k", "tt", "label")
    val out = AsOfJoin.asof(trades, quotes, "k", "tt", "qt",
      Map("px" -> "asof_px"))
      .select(col("label"), col("asof_px"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("at-quote" -> 101.0, "between" -> 101.0, "after-all" -> 102.0))
  }

  test("salted skew join == plain join on a pathologically skewed key") {
    import spark.implicits._
    // 10k rows of one hot key + a few cold keys
    val skewed = ((1 to 10000).map(i => (1L, i)) ++ Seq((2L, -1), (3L, -2)))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "cold2"), (4L, "absent")).toDF("dk", "name")
    val plain = skewed.join(dim, col("k") === col("dk"))
      .select(col("k"), col("payload"), col("name"))
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedEquiJoin(skewed, dim, "k", "dk", salt = 8)
      .select(col("k"), col("payload"), col("name"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain && plain.size == 10001)
  }

  test("as-of join on the events fixture matches a window-computed oracle") {
    val events = Tables.events(spark, sfDir)
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = events.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val got = AsOfJoin.asof(p, v, "user_id", "ts", "ts",
      Map("event_id" -> "view_id"))
      .select(col("event_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent oracle: max view ts <= purchase ts via a join + groupBy
    val pairs = p.select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pt"))
      .join(v.select(col("event_id").as("vid"), col("user_id").as("vu"), col("ts").as("vt")),
        col("pu") === col("vu") && col("vt") <= col("pt"))
    val latest = pairs.groupBy(col("pid")).agg(max(col("vt")).as("mvt"))
    val want = pairs.join(latest, Seq("pid"))
      .filter(col("vt") === col("mvt"))
      .select(col("pid"), col("vid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("bloom-pruned semi join handles string keys (xxhash64 makes it type-generic)") {
    import spark.implicits._
    val probe = (1 to 500).map(i => (s"key_$i", i)).toDF("k", "v")
    val build = (1 to 500).filter(_ % 7 == 0).map(i => s"key_$i").toDF("k")
    val pruned = graft.operators.JoinPruning
      .bloomSemiJoin(probe, build, "k", expectedKeys = 100L)
      .collect().map(_.getString(0)).toSet
    val plain = probe.join(build, Seq("k"), "left_semi")
      .collect().map(_.getString(0)).toSet
    assert(pruned == plain && pruned.nonEmpty)
  }
}
