package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest sources mirroring the reference's load path: the dispatcher
  * ingests pipe-delimited `.tbl` files (reference:
  * src/tpch/source/tpchDataLoader.cc — TPC-H dbgen format), and the Spark
  * side adds CSV/JSON as first-class sources. All are plain DataFrameReader
  * plans, so pushdown/pruning apply and ingest parallelism is the file
  * split count.
  */
object Sources {

  /** pipe-delimited TPC-H dbgen `.tbl` (possibly with a trailing '|') */
  def readTbl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("delimiter", "|")
      .option("header", "false")
      .schema(schema)
      .csv(path)

  def writeTbl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("delimiter", "|").option("header", "false").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).schema(schema).csv(path)

  def readJsonLines(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC — the columnar alternative to parquet (predicate pushdown and
    * column pruning apply the same way; useful when the lakehouse standard
    * is ORC rather than parquet).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Raw-file ingest for multimodal payloads: each matched file becomes a
    * row (path, modificationTime, length, content binary) — the entry
    * point of the opaque-binary multimodal pipeline
    * (graft.operators.Multimodal); file splits drive parallelism and
    * `pathGlobFilter` prunes at listing time, before any byte is read.
    */
  def readBinaryFiles(
      spark: SparkSession, path: String, glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }
}
