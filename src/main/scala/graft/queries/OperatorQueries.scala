package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** One query per core operator class from SURVEY.md §2, each with a DuckDB
  * oracle. These exercise the operator surface directly (selection,
  * multi-selection/flatten, distinct-as-groupby, top-k, partition,
  * equi/non-equi/cartesian joins, window functions, event-time grouping,
  * sessionization).
  */
object OperatorQueries {

  /** SelectionComp — filter + project in one op
    * (reference: src/lambdas/headers/SelectionComp.h:13-23).
    */
  def selection(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .filter(col("c_acctbal") > 5000.0 && col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  val selectionSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE c_acctbal > 5000.0 AND c_mktsegment = 'BUILDING'""".stripMargin

  /** MultiSelectionComp + Flatten — vector-valued projection exploded
    * (reference: src/lambdas/headers/MultiSelectionComp.h:16-24,
    * TCAP Flatten src/logicalPlan/headers/AtomicComputationClasses.h:219).
    */
  def flatten(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .filter(col("lang") === "en")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))

  val flattenSql: String =
    """SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |FROM documents WHERE lang = 'en'""".stripMargin

  /** Distinct-as-groupby — the reference expresses DISTINCT as an aggregate
    * with the value ignored (reference:
    * src/sharedLibraries/headers/DistinctProjection.h).
    */
  def distinctPairs(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()

  val distinctPairsSql: String =
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"

  /** TopKComp fast path — TakeOrderedAndProject, deterministic tiebreak
    * (reference: src/queryExecution/headers/TopKComp.h:21-37). The
    * bounded-heap Aggregator variant is exercised in the test suite.
    */
  def topOrders(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  val topOrdersSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** PartitionComp — repartition by key, content unchanged
    * (reference: src/lambdas/headers/PartitionComp.h:15-26).
    */
  def partitioned(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .repartition(col("l_returnflag"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))

  val partitionedSql: String =
    "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem"

  /** JoinComp with equi key + non-equi residual — the residual native lambda
    * stays a post-join filter (reference: src/lambdas/headers/JoinComp.h:45,
    * AndLambda.h:140-253 conjunct split).
    */
  def joinResidual(spark: SparkSession, d: String): DataFrame =
    Tables.supplier(spark, d)
      .join(Tables.customer(spark, d),
        col("s_nationkey") === col("c_nationkey") && col("s_acctbal") > col("c_acctbal"))
      .select(col("s_suppkey"), col("c_custkey"))

  val joinResidualSql: String =
    """SELECT s_suppkey, c_custkey
      |FROM supplier JOIN customer
      | ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal""".stripMargin

  /** Pure non-equi join — the cartesian TCAP fallback
    * (reference: src/lambdas/headers/CPlusPlusLambda.h:315).
    */
  def joinCartesian(spark: SparkSession, d: String): DataFrame =
    Tables.region(spark, d)
      .crossJoin(Tables.nation(spark, d))
      .filter(col("r_regionkey") =!= col("n_regionkey"))
      .select(col("r_name"), col("n_name"))

  val joinCartesianSql: String =
    """SELECT r_name, n_name FROM region, nation
      |WHERE r_regionkey <> n_regionkey""".stripMargin

  /** Window functions — absent from the reference (SURVEY.md §2.1 "no window
    * functions"), exposed as a capability upgrade: top-3 customers by
    * balance per nation.
    */
  def windowRank(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, d)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("c_nationkey"), col("rnk"), col("c_custkey"), col("c_acctbal"))
  }

  val windowRankSql: String =
    """SELECT c_nationkey, rnk, c_custkey, c_acctbal FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |  FROM customer) t WHERE rnk <= 3""".stripMargin

  /** Event-time bucketing — hourly tumbling-window aggregate over the events
    * table (batch form; the streaming form is graft.streaming).
    */
  def eventsHourly(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(
        date_format(col("ts"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  val eventsHourlySql: String =
    """SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS hour, event_type,
      | COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Sessionization — gap-based (30 min) sessions per user via window
    * functions; the stateful streaming form is graft.streaming.
    */
  def sessionize(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"))
  }

  val sessionizeSql: String =
    """SELECT user_id, session_seq, COUNT(*) AS n_events FROM (
      |  SELECT user_id, CAST(SUM(new_sess) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |             OR CAST(floor(epoch(ts)) AS BIGINT) -
      |                CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
      |                     ORDER BY ts, event_id))) AS BIGINT) > 1800
      |           THEN 1 ELSE 0 END AS new_sess
      |    FROM events) g) s
      |GROUP BY user_id, session_seq""".stripMargin

  /** semi-structured extraction: pull a typed field out of the JSON props
    * column and aggregate on it — no JSON support exists in the reference
    * (all scalar work is raw C++ lambdas, SURVEY §2.1).
    */
  def jsonExtract(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k") >= 50)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"))

  val jsonExtractSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      | CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events
      |WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
      |GROUP BY event_type""".stripMargin

  /** as-of join: each purchase event attached to the user's latest
    * prior-or-equal view event — an operator absent from the reference
    * (graft.operators.AsOfJoin; oracle uses DuckDB's native ASOF JOIN).
    */
  def asofViews(spark: SparkSession, d: String): DataFrame = {
    val events = Tables.events(spark, d)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.AsOfJoin.asof(purchases, views, "user_id", "ts", "ts",
      Map("event_id" -> "view_event_id"))
      .select(col("event_id").as("purchase_event_id"), col("view_event_id"))
  }

  val asofViewsSql: String =
    """SELECT p.event_id AS purchase_event_id, v.event_id AS view_event_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin

  /** Exact quantiles, linearly interpolated — no quantile/median exists
    * anywhere in the reference.
    *
    * NOT `percentile()`: that is a TypedImperativeAggregate which buffers
    * EVERY value of a group in one aggregation buffer — a driver-sized
    * memory wall at 100 TB. This plan sorts the group distributedly
    * (window row_number over the shuffle sort), keeps only the ≤2 rows
    * flanking each requested quantile position, and interpolates with the
    * same ((n−1)·q) formula `percentile`/`quantile_cont` use — so results
    * stay bitwise-identical to the DuckDB oracle while memory per task
    * stays O(1).
    */
  def quantiles(spark: SparkSession, d: String): DataFrame = {
    val qs = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75")
    val vals = Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_extendedprice").as("v"))
    val counts = vals.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("v"))
    val ranked = vals
      .withColumn("rn", row_number().over(w).cast("long") - 1)
      .join(broadcast(counts), Seq("l_returnflag"))
    def pos(q: Double) = lit(q) * (col("n") - 1).cast("double")
    // keep only rows sitting at a floor/ceil position of some quantile
    val needed = ranked.filter(
      qs.map { case (q, _) =>
        col("rn") === floor(pos(q)).cast("long") ||
          col("rn") === ceil(pos(q)).cast("long")
      }.reduce(_ || _))
    val aggs = qs.map { case (q, name) =>
      val p = lit(q) * (max(col("n")) - 1).cast("double")
      val f = p - floor(p)
      val lo = max(when(col("rn") === floor(pos(q)).cast("long"), col("v")))
      val hi = max(when(col("rn") === ceil(pos(q)).cast("long"), col("v")))
      // lo*(1-f) + hi*f, NOT lo+(hi-lo)*f: quantile_cont interpolates the
      // convex-combination form and the two differ in the last double bits
      (lo * (lit(1.0) - f) + hi * f).as(name)
    }
    needed.groupBy(col("l_returnflag")).agg(aggs.head, aggs.tail: _*)
  }

  val quantilesSql: String =
    """SELECT l_returnflag,
      | quantile_cont(l_extendedprice, 0.25) AS p25,
      | quantile_cont(l_extendedprice, 0.5) AS p50,
      | quantile_cont(l_extendedprice, 0.75) AS p75
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** ROLLUP grouping sets — absent from the reference ("no grouping sets /
    * cube / rollup", SURVEY §2.1)
    */
  def rollup(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(TpchQueries.d2(col("l_quantity"))).cast("double").as("sum_qty"))

  val rollupSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** set operators (union / intersect / except) — absent from the
    * reference ("no set operators", SURVEY §2.1): nations having customers
    * but no suppliers, plus the intersection.
    */
  def setOps(spark: SparkSession, d: String): DataFrame = {
    val custNations = Tables.customer(spark, d)
      .select(col("c_nationkey").as("nationkey")).distinct()
    val suppNations = Tables.supplier(spark, d)
      .select(col("s_nationkey").as("nationkey")).distinct()
    custNations.except(suppNations).withColumn("src", lit("cust_only"))
      .unionByName(custNations.intersect(suppNations).withColumn("src", lit("both")))
  }

  val setOpsSql: String =
    """SELECT nationkey, 'cust_only' AS src FROM (
      |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |  EXCEPT SELECT DISTINCT s_nationkey FROM supplier) a
      |UNION ALL
      |SELECT nationkey, 'both' AS src FROM (
      |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |  INTERSECT SELECT DISTINCT s_nationkey FROM supplier) b""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_rollup" -> rollup,
    "op_setops" -> setOps,
    "op_quantiles" -> quantiles,
    "op_asof_join" -> asofViews,
    "op_json_extract" -> jsonExtract,
    "op_selection" -> selection,
    "op_flatten" -> flatten,
    "op_distinct" -> distinctPairs,
    "op_topk" -> topOrders,
    "op_partition" -> partitioned,
    "op_join_residual" -> joinResidual,
    "op_join_cartesian" -> joinCartesian,
    "op_window_rank" -> windowRank,
    "op_events_hourly" -> eventsHourly,
    "op_sessionize" -> sessionize)

  val oracles: Map[String, String] = Map(
    "op_rollup" -> rollupSql,
    "op_setops" -> setOpsSql,
    "op_quantiles" -> quantilesSql,
    "op_asof_join" -> asofViewsSql,
    "op_json_extract" -> jsonExtractSql,
    "op_selection" -> selectionSql,
    "op_flatten" -> flattenSql,
    "op_distinct" -> distinctPairsSql,
    "op_topk" -> topOrdersSql,
    "op_partition" -> partitionedSql,
    "op_join_residual" -> joinResidualSql,
    "op_join_cartesian" -> joinCartesianSql,
    "op_window_rank" -> windowRankSql,
    "op_events_hourly" -> eventsHourlySql,
    "op_sessionize" -> sessionizeSql)
}
