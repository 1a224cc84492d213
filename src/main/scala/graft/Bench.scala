package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Results are forced through
  * the noop DSv2 sink so the whole plan executes (a bare count() would let
  * Spark prune projections).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated subset filter for isolated profiling
    // (whitespace-tolerant; empty/blank value means "no filter")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    // Untimed JIT/codegen/reader warmup on SYNTHETIC data (JMH practice;
    // measured elsewhere at ~10 s of first-query cost otherwise — scheduler,
    // whole-stage-codegen compiler, parquet + shuffle paths all cold). No
    // fixture data is read or cached, so no timed query gets a data head
    // start; this only stops the alphabetically-first query from carrying
    // the JVM's one-time startup cost.
    locally {
      import org.apache.spark.sql.functions._
      val w = spark.range(0, 200000).toDF("id")
        .withColumn("k", col("id") % 97)
        .withColumn("s", concat(lit("w"), col("id") % 31))
      val agg = w.groupBy("k").agg(count(lit(1)).as("c"), sum("id").as("s"))
      val j = agg.join(w.select(col("k"), col("s")).distinct(), "k")
        .orderBy(desc("c")).limit(100)
      j.write.format("noop").mode("overwrite").save()
      val tmp = java.nio.file.Files.createTempDirectory("graft-warm").toString
      w.limit(1000).write.mode("overwrite").parquet(tmp)
      spark.read.parquet(tmp).filter(col("k") > 3).select(col("s"))
        .write.format("noop").mode("overwrite").save()
    }
    // Two timed passes per query, report the MIN: this host swings 1.5-3×
    // between IO regimes (README "Bench noise"), and a single-pass number
    // cannot distinguish a plan regression from landing in the slow window.
    // min-of-2 is the standard noise floor estimator (both passes are kept
    // in the artifact under "passes" so the regime itself stays visible).
    val passes = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(2)
    // A pass that throws records NaN, not its (fast-failure) wall time —
    // otherwise an instant plan error would become the reported minimum
    // and a broken query would read as a speedup.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Double.NaN
        }
      }
      name -> times
    }
    def minOk(v: Seq[Double]): Option[Double] = {
      val ok = v.filterNot(_.isNaN)
      if (ok.isEmpty) None else Some(ok.min)
    }
    def r3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    // The stdout line must stay SHORT: the driver parses it out of a
    // bounded tail of the log, and the r6 line (full-precision doubles
    // plus a per-pass map for 98 queries) overflowed that window and
    // arrived unparsed. Millisecond precision, min-of-passes only; the
    // full-precision per-pass detail goes to target/bench_latest.json.
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + minOk(v).map(r3).getOrElse("null")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if minOk(v).isEmpty => k }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.flatMap(r => minOk(r._2)).sum
    val json = s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
      s""""queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(json)
    // Full-precision artifact with every pass, for regime analysis.
    locally {
      val ps = results.map { case (k, v) =>
        "\"" + k + "\":" + v.map(d => if (d.isNaN) "null" else d.toString)
          .mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val full = s"""{"metric":"total","value":$total,"unit":"sec",""" +
        s""""queries":$qs,"failed":$failedJson,"passes":$ps,"sf":"$sfDir"}"""
      val out = java.nio.file.Paths.get("target", "bench_latest.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
