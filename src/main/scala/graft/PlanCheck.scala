package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan auditor: prints the formatted physical plan of selected queries and
  * flags scale smells (missing pushed filters, cartesian products where a
  * broadcast was intended, non-codegen stages).
  * Usage: runMain graft.PlanCheck [sfDir] [queryName...]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        println(s"\n========== $n ==========")
        try {
          val df = fn(spark, sfDir)
          val s = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          println(s)
          val smells = Seq(
            "CartesianProduct" -> s.contains("CartesianProduct"),
            "PushedFilters: []" -> s.contains("PushedFilters: []"),
            "BroadcastNestedLoopJoin" -> s.contains("BroadcastNestedLoopJoin"))
            .collect { case (k, true) => k }
          if (smells.nonEmpty) println(s"[smell] $n: ${smells.mkString(", ")}")
        } catch { case e: Throwable => println(s"[plancheck] $n failed: $e") }
      }
    }
    spark.stop()
  }
}
