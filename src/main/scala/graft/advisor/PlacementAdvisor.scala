package graft.advisor

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Aggregate}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Lachesis-lite: the self-learning data-placement layer, rule-based
  * variant (reference: src/selfLearning/headers/
  * RuleBasedDataPlacementOptimizerForLoadJob.h:14-29 — "most frequent /
  * selective join or agg key among consumers of the loaded type"; history
  * DB schema SelfLearningDB.cc:109-150; DRL variant out of scope per
  * SURVEY.md §4.3).
  *
  * Workflow: `observe(df)` after running a query logs which columns of
  * which source tables appeared as equi-join or group-by keys (the lambda
  * traversal role of Lambda.h:55 traverseForSelfLearning);
  * `recommend(table)` returns the most frequently used key — the column to
  * bucket/repartition the stored set by so those joins/aggs become local.
  */
final class PlacementAdvisor {

  /** (table, column) -> observed key-use count; join uses weigh double
    * (they save two exchanges when co-partitioned)
    */
  private val keyUse = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
  private val history = mutable.ListBuffer.empty[(String, Long)]

  private def tableOf(attr: AttributeReference, plan: LogicalPlan): Option[String] = {
    var found: Option[String] = None
    plan.foreach {
      case r: LogicalRelation if r.output.exists(_.exprId == attr.exprId) =>
        found = r.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.headOption.map { p =>
              val name = p.getName
              if (name.endsWith(".parquet")) name.stripSuffix(".parquet") else name
            }
          case _ => None
        }
      case _ => ()
    }
    found
  }

  private def recordKeys(cond: Expression, plan: LogicalPlan, weight: Long): Unit =
    cond.foreach {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        Seq(a, b).foreach { attr =>
          tableOf(attr, plan).foreach { t =>
            keyUse((t, attr.name)) += weight
          }
        }
      case _ => ()
    }

  /** log one executed query's analyzed plan + latency */
  def observe(df: DataFrame, latencyMs: Long = 0L): Unit = {
    val plan = df.queryExecution.analyzed
    plan.foreach {
      case j: Join =>
        j.condition.foreach(recordKeys(_, plan, weight = 2L))
      case a: Aggregate =>
        a.groupingExpressions.foreach {
          case attr: AttributeReference =>
            tableOf(attr, plan).foreach(t => keyUse((t, attr.name)) += 1L)
          case _ => ()
        }
      case _ => ()
    }
    history += ((plan.nodeName, latencyMs))
  }

  /** the partition/bucket column to use when saving `table`, if any
    * consumer pattern was observed
    */
  def recommend(table: String): Option[String] =
    keyUse.filter(_._1._1 == table) match {
      case m if m.isEmpty => None
      case m => Some(m.maxBy { case ((_, c), n) => (n, c) }._1._2)
    }

  def observedKeyUse: Map[(String, String), Long] = keyUse.toMap

  /** save with the learned placement applied (the load-path hook — EP3 in
    * SURVEY.md §3, DispatcherServer + partition policy)
    */
  def saveWithPlacement(
      catalog: graft.storage.SetCatalog, db: String, set: String,
      table: String, df: DataFrame): Unit =
    catalog.createSet(db, set, df, recommend(table))
}
