package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.advisor.PlacementAdvisor
import graft.model.Tables
import graft.storage.SetCatalog

class AdvisorSpec extends GraftSpecBase {

  test("advisor learns the dominant join key from observed plans") {
    val adv = new PlacementAdvisor
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    // two joins on l_orderkey, one aggregate on l_partkey
    adv.observe(li.join(o, col("l_orderkey") === col("o_orderkey")))
    adv.observe(li.join(o, col("l_orderkey") === col("o_orderkey")))
    adv.observe(li.groupBy(col("l_partkey")).count())
    assert(adv.recommend("lineitem").contains("l_orderkey"))
    assert(adv.recommend("orders").contains("o_orderkey"))
    assert(adv.recommend("nation").isEmpty)
  }

  test("set catalog: create / scan / meta / list / remove round-trip") {
    val root = Files.createTempDirectory("graft-sets").toString
    val cat = new SetCatalog(spark, root)
    val df = Tables.nation(spark, sfDir)
    cat.createSet("db1", "nations", df, Some("n_regionkey"), 4)
    assert(cat.scanSet("db1", "nations").count() == 25)
    val m = cat.meta("db1", "nations").get
    assert(m.partitionColumn.contains("n_regionkey") && m.numPartitions == 4 && m.rows == 25)
    assert(cat.listSets() == Seq(("db1", "nations")))
    cat.removeSet("db1", "nations")
    assert(cat.listSets().isEmpty)
  }

  test("co-bucketed sets join with no shuffle exchange (the Lachesis local-join payoff)") {
    val root = Files.createTempDirectory("graft-buckets").toString
    val cat = new SetCatalog(spark, root)
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    cat.createBucketedSet("bk", "lineitem", li, "l_orderkey", 4)
    cat.createBucketedSet("bk", "orders", o, "o_orderkey", 4)
    val joined = cat.scanBucketedSet("bk", "lineitem")
      .join(cat.scanBucketedSet("bk", "orders"),
        col("l_orderkey") === col("o_orderkey"))
    // disable broadcast so the join strategy must exploit bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(joined.count() == li.count(), "inner join on FK preserves lineitems")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("advisor placement applied on save co-partitions the set") {
    val root = Files.createTempDirectory("graft-sets2").toString
    val cat = new SetCatalog(spark, root)
    val adv = new PlacementAdvisor
    val li = Tables.lineitem(spark, sfDir)
    adv.observe(li.join(Tables.orders(spark, sfDir),
      col("l_orderkey") === col("o_orderkey")))
    adv.saveWithPlacement(cat, "db1", "lineitem_placed", "lineitem", li)
    val m = cat.meta("db1", "lineitem_placed").get
    assert(m.partitionColumn.contains("l_orderkey"))
    assert(cat.scanSet("db1", "lineitem_placed").count() == li.count())
  }
}
