package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** TPC-H-subset queries, adapted to the fixture schema (TESTDATA.md — no
  * partsupp/phone/comment/commitdate columns). These reproduce the query
  * *capabilities* of the reference's TPC-H drivers
  * (reference: src/tpch/headers/Query01.h … Query22.h).
  *
  * Oracle-parity note: double aggregates are computed by casting each input
  * value to DECIMAL(18,2) (exact, associative sum — independent of partition
  * order), then casting the exact sum back to double. Both Spark and DuckDB
  * perform the same half-away-from-zero double→decimal rounding, so results
  * are bit-identical regardless of execution order — where a raw double sum
  * would differ between engines in the last bits.
  */
object TpchQueries {

  /** Cast a (2-decimal-place) base column to exact decimal. Products of
    * casted factors then stay exact (scale adds, precision ≤ 38), so sums
    * are order-independent and bit-identical across engines — casting a
    * *computed double product* instead would hit engine-specific
    * double→decimal rounding at representable midpoints.
    */
  private[queries] def d2(c: Column): Column = c.cast("decimal(12,2)")
  /** exact decimal sum of an already-decimal expression, returned as double */
  private[queries] def dsum(c: Column): Column = sum(c).cast("double")
  /** deterministic average: exact decimal sum / count, in double */
  private[queries] def davg(c: Column): Column = dsum(c) / count(lit(1))
  private val d2Sql = (e: String) => s"CAST($e AS DECIMAL(12,2))"
  private val dsumSql = (e: String) => s"CAST(SUM($e) AS DOUBLE)"
  private val davgSql = (e: String) => s"${dsumSql(e)}/COUNT(*)"
  /** l_extendedprice * (1 - l_discount), exactly */
  private val discPrice: Column = d2(col("l_extendedprice")) * d2(lit(1) - col("l_discount"))
  private val discPriceSql: String =
    s"${d2Sql("l_extendedprice")} * ${d2Sql("1-l_discount")}"

  /** Q1 pricing summary — multi-measure group-by
    * (reference: src/tpch/headers/Query01.h:62-135 Q01ValueClass/Q01AggOut).
    */
  def q1(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(d2(col("l_quantity"))).as("sum_qty"),
        dsum(d2(col("l_extendedprice"))).as("sum_base_price"),
        dsum(discPrice).as("sum_disc_price"),
        dsum(discPrice * d2(lit(1) + col("l_tax"))).as("sum_charge"),
        davg(d2(col("l_quantity"))).as("avg_qty"),
        davg(d2(col("l_extendedprice"))).as("avg_price"),
        davg(d2(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       | ${dsumSql(d2Sql("l_quantity"))} AS sum_qty,
       | ${dsumSql(d2Sql("l_extendedprice"))} AS sum_base_price,
       | ${dsumSql(discPriceSql)} AS sum_disc_price,
       | ${dsumSql(s"$discPriceSql * ${d2Sql("1+l_tax")}")} AS sum_charge,
       | ${davgSql(d2Sql("l_quantity"))} AS avg_qty,
       | ${davgSql(d2Sql("l_extendedprice"))} AS avg_price,
       | ${davgSql(d2Sql("l_discount"))} AS avg_disc,
       | COUNT(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Q2-style min-cost supplier — min-via-monoid + join-back
    * (reference: src/tpch/headers/Query02.h:312-330 MinDouble operator+).
    * Adapted: cheapest supplier (min s_acctbal) per region.
    */
  def q2(spark: SparkSession, d: String): DataFrame = {
    val s = Tables.supplier(spark, d)
    val n = broadcast(Tables.nation(spark, d))
    val r = broadcast(Tables.region(spark, d))
    // shared subtree of the min aggregation AND the probe side — persist
    // so the 3-way join executes once, not twice (the multi-sink sharing
    // pattern; a window-by-region one-pass form would instead funnel every
    // row into 5 region partitions, which does not scale)
    val joined = s
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .persist()
    val minPerRegion = joined.groupBy(col("r_regionkey").as("mr_regionkey"))
      .agg(min(col("s_acctbal")).as("min_bal"))
    val out = joined
      .join(broadcast(minPerRegion),
        col("r_regionkey") === col("mr_regionkey") && col("s_acctbal") === col("min_bal"))
      .select(col("r_name"), col("n_name"), col("s_name"), col("s_acctbal"))
      // the result is a handful of rows — materialize it eagerly so the
      // shared-subtree cache can be released here instead of leaking
      // cached blocks across repeated calls in one session
      .localCheckpoint(eager = true)
    joined.unpersist(blocking = false)
    out
  }

  val q2Sql: String =
    """SELECT r_name, n_name, s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |WHERE s_acctbal = (
      |  SELECT MIN(s_acctbal) FROM supplier s2
      |   JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |  WHERE n2.n_regionkey = region.r_regionkey)""".stripMargin

  /** Q3 shipping priority — 3-way join + agg + deterministic top-10
    * (reference: src/tpch/headers/Query03.h).
    */
  def q3(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(discPrice).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, o_orderdate,
       | ${dsumSql(discPriceSql)} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       | JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |  AND l_shipdate > TIMESTAMP '1997-01-01'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin

  /** Q4 order priority — EXISTS as left-semi join with non-equi residual
    * (reference: src/tpch/headers/Query04.h; adapted: l_shipdate >
    * o_orderdate stands in for the missing commit/receipt dates).
    */
  def q4(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, d)
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  /** Q6 forecast revenue — filter + global sum
    * (reference: src/tpch/headers/Query06.h:47-50 date-range selection).
    */
  def q6(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(d2(col("l_extendedprice")) * d2(col("l_discount"))).as("revenue"))

  val q6Sql: String =
    s"""SELECT ${dsumSql(s"${d2Sql("l_extendedprice")} * ${d2Sql("l_discount")}")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Q12-style shipping-mode stats — join + conditional aggregation
    * (reference: src/tpch/headers/Query12.h; l_linestatus stands in for the
    * missing l_shipmode).
    */
  def q12(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val l = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_linestatus""".stripMargin

  /** Q13 customer order distribution — true left-outer + two-level agg.
    * The reference approximates with an inner JoinComp
    * (src/tpch/headers/Query13.h:93); we resolve in favor of the SQL spec
    * (SURVEY.md §7.4 risk 4).
    */
  def q13(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count""".stripMargin

  /** Q14 promo revenue — join + conditional ratio
    * (reference: src/tpch/headers/Query14.h; p_type is a plain category in
    * the fixture so the predicate is equality, not LIKE 'PROMO%').
    */
  def q14(spark: SparkSession, d: String): DataFrame = {
    val p = broadcast(Tables.part(spark, d))
    val l = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        dsum(when(col("p_type") === "PROMO", discPrice)) /
        dsum(discPrice))
        .as("promo_revenue"))
  }

  val q14Sql: String =
    s"""SELECT 100.0 *
       | ${dsumSql(s"CASE WHEN p_type = 'PROMO' THEN $discPriceSql END")} /
       | ${dsumSql(discPriceSql)} AS promo_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1996-07-01'""".stripMargin

  /** Q17 small-quantity-order revenue — agg subquery + join + filter
    * (reference: src/tpch/headers/Query17.h).
    */
  def q17(spark: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(spark, d)
    val p = broadcast(Tables.part(spark, d).filter(col("p_brand") === "Brand#13"))
    // Restrict to Brand#13 lineitems *before* the per-part average: p_partkey
    // is unique, so the per-key average is unchanged, and at scale the heavy
    // groupBy only sees the filtered fraction instead of the whole fact table.
    val lp = l.join(p, col("l_partkey") === col("p_partkey"))
    val avgQty = lp.groupBy(col("l_partkey").as("a_partkey"))
      .agg(davg(d2(col("l_quantity"))).as("avg_qty"))
    lp.join(broadcast(avgQty), col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((dsum(d2(col("l_extendedprice"))) / lit(7.0)).as("avg_yearly"))
  }

  val q17Sql: String =
    s"""SELECT ${dsumSql(d2Sql("l_extendedprice"))}/7.0 AS avg_yearly
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       | JOIN (SELECT l_partkey AS a_partkey, ${davgSql(d2Sql("l_quantity"))} AS avg_qty
       |       FROM lineitem GROUP BY l_partkey) a ON l_partkey = a_partkey
       |WHERE p_brand = 'Brand#13' AND l_quantity < 0.2 * avg_qty""".stripMargin

  /** Q22-style — scalar-subquery filter + NOT EXISTS as left-anti join
    * (reference: src/tpch/headers/Query22.h:99-151, which hand-rewrites
    * NOT EXISTS into agg + filter + join; anti join is the Spark-native
    * form. c_nationkey stands in for the missing phone country code.)
    */
  def q22(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    // "idle" = no orders since 1999 (every fixture customer has *some*
    // order, so the unscoped NOT EXISTS would be vacuously empty)
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg(davg(d2(col("c_acctbal"))).as("avg_bal"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dsum(d2(col("c_acctbal"))).as("totacctbal"))
  }

  val q22Sql: String =
    s"""SELECT c_nationkey, COUNT(*) AS numcust,
       | ${dsumSql(d2Sql("c_acctbal"))} AS totacctbal
       |FROM customer
       |WHERE c_acctbal > (SELECT ${davgSql(d2Sql("c_acctbal"))} FROM customer
       |                   WHERE c_acctbal > 0.0)
       |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
       |GROUP BY c_nationkey""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1,
    "q2_min_supplier" -> q2,
    "q3_shipping_priority" -> q3,
    "q4_order_priority" -> q4,
    "q6_revenue" -> q6,
    "q12_priority_lines" -> q12,
    "q13_cust_distribution" -> q13,
    "q14_promo_revenue" -> q14,
    "q17_small_qty_revenue" -> q17,
    "q22_idle_customers" -> q22)

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_min_supplier" -> q2Sql,
    "q3_shipping_priority" -> q3Sql,
    "q4_order_priority" -> q4Sql,
    "q6_revenue" -> q6Sql,
    "q12_priority_lines" -> q12Sql,
    "q13_cust_distribution" -> q13Sql,
    "q14_promo_revenue" -> q14Sql,
    "q17_small_qty_revenue" -> q17Sql,
    "q22_idle_customers" -> q22Sql)
}
