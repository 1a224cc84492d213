package graft.storage

import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Spark SQL catalog plugin over the [[SetCatalog]] layout — the
  * reference's (databaseName, setName) catalog surfaced as a first-class
  * SQL namespace (reference: src/serverFunctionalities/headers/
  * CatalogServer.h:59, CatalogClient.h — createDatabase/createSet/
  * removeSet; clients address data as "db.set" strings). Register with
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.storage.GraftCatalog
  *   spark.sql.catalog.graft.root = /path/to/sets
  * }}}
  *
  * and every stored set is queryable as `graft.<db>.<set>` from plain SQL
  * — SELECT, CTAS, DROP, SHOW TABLES — with scans planned by the native
  * DSv2 parquet reader (full pushdown/pruning/vectorization; the catalog
  * adds name resolution only, nothing sits between Catalyst and the
  * files, so 100 TB scans plan identically to `spark.read.parquet`).
  */
/** Read-side delegate that hides a table's write capability — served for
  * bucketed sets, whose layout only [[SetCatalog.createBucketedSet]] may
  * produce (see [[GraftCatalog.loadTable]]).
  */
private[storage] class ReadOnlyTable(delegate: Table)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  override def name(): String = delegate.name()
  override def schema(): StructType = delegate.schema()
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    delegate.capabilities().asScala
      .filter(_ == org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)
      .asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    delegate.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(options)
}

class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root"))
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-sets")
    Files.createDirectories(Paths.get(root))
    // Standing-pipeline posture by DEFAULT (VERDICT r15 next #8): this
    // catalog OWNS its root — every set under it was created by graft's
    // own DDL or lifecycle machinery — so a driver restart closes any
    // crash-to-recovery serving window at open. Safe because recoverAll
    // replays markers (authoritative) and sweeps only staging-TAGGED
    // conventional names; a user set named *_rebuild is untouched.
    // Opt out with `spark.sql.catalog.<name>.recoverOnOpen = false`
    // (e.g. a read-only inspector of a live pipeline's root —
    // single-writer contract in SetCatalog.recoverAll's scaladoc).
    if (Option(options.get("recoverOnOpen")).forall(_.toBoolean)) {
      val healed = new SetCatalog(spark, root).recoverAllDbs()
      if (healed.nonEmpty)
        System.err.println(
          s"[graft] catalog $name healed at open: ${healed.mkString(", ")}")
    }
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active

  private def db(ident: Identifier): String = {
    if (ident.namespace().length != 1)
      throw new NoSuchTableException(ident)
    ident.namespace()(0)
  }
  private def dir(ident: Identifier): java.nio.file.Path =
    Paths.get(root, s"${db(ident)}.${ident.name()}")
  private def metaPath(ident: Identifier): java.nio.file.Path =
    Paths.get(root, s"${db(ident)}.${ident.name()}.meta")
  private def schemaPath(ident: Identifier): java.nio.file.Path =
    Paths.get(root, s"${db(ident)}.${ident.name()}.schema")

  /** Bucket layout recorded by [[SetCatalog.createBucketedSet]]'s sidecar
    * meta, surfaced so the analyzer rule (graft.plans.BucketedSetReads)
    * can re-plan SQL reads of `graft.<db>.<set>` with the bucket spec —
    * without it, two co-bucketed sets joined through the SQL catalog
    * would re-shuffle, losing the engine's local-join payoff (reference:
    * src/builtInPDBObjects/headers/ScanUserSet.h:69-76). Returns
    * (data path, bucket columns, bucket count) for bucketed sets only —
    * composite bucket keys are recorded comma-joined in the sidecar.
    */
  def bucketLayoutOf(ident: Identifier): Option[(String, Seq[String], Int)] = {
    if (ident.namespace().length != 1) return None
    val p = metaPath(ident)
    if (!Files.exists(p)) return None
    val lines = Files.readString(p).split("\n", -1)
    if (lines.length > 3 && lines(3) == "bucket" && lines(0).nonEmpty)
      Some((dir(ident).toString, lines(0).split(",").toSeq, lines(1).toInt))
    else None
  }

  // -- tables ---------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.length != 1) throw new NoSuchNamespaceException(namespace)
    val prefix = namespace(0) + "."
    Files.list(Paths.get(root)).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(prefix))
      .map(p => Identifier.of(namespace, p.getFileName.toString.stripPrefix(prefix)))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val path = dir(ident)
    if (!Files.isDirectory(path)) throw new NoSuchTableException(ident)
    // DDL-declared schema (sidecar) wins; data-first sets (SetCatalog
    // writes, no sidecar) infer from their parquet footers as usual.
    // Without this, INSERT into a freshly-declared (still empty) table
    // would fail schema inference.
    val declared =
      if (Files.exists(schemaPath(ident)))
        Some(org.apache.spark.sql.types.DataType
          .fromJson(Files.readString(schemaPath(ident)))
          .asInstanceOf[StructType])
      else None
    val table = ParquetTable(
      s"$catalogName.${db(ident)}.${ident.name()}", spark,
      CaseInsensitiveStringMap.empty(), Seq(path.toString), declared,
      classOf[ParquetFileFormat])
    // A bucketed set's files carry bucket ids in their NAMES and every
    // row must sit in its key's bucket file — a plain SQL INSERT would
    // drop unbucketed files into the directory and silently break the
    // bucket contract the zero-exchange join plan relies on. So bucketed
    // sets are read-only through SQL; rewrites go through
    // SetCatalog.createBucketedSet (the reference's dispatcher likewise
    // owns placement — data enters a partitioned set only through it).
    if (bucketLayoutOf(ident).isDefined) new ReadOnlyTable(table) else table
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (Files.isDirectory(dir(ident))) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "graft catalog: partition transforms are chosen by the placement " +
        "advisor at write time, not declared in DDL")
    Files.createDirectories(dir(ident))
    // sidecar meta mirrors SetCatalog.createSet defaults; rows filled by
    // the first write (CTAS) are unknown at DDL time
    Files.writeString(metaPath(ident), "\n0\n0\nnone\n\n")
    Files.writeString(schemaPath(ident), schema.json)
    ParquetTable(
      s"$catalogName.${db(ident)}.${ident.name()}", spark,
      CaseInsensitiveStringMap.empty(), Seq(dir(ident).toString), Some(schema),
      classOf[ParquetFileFormat])
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER TABLE is not supported; rewrite the set")

  override def dropTable(ident: Identifier): Boolean = {
    val path = dir(ident)
    if (!Files.isDirectory(path)) return false
    SetCatalog.deleteTree(path)
    Files.deleteIfExists(metaPath(ident))
    Files.deleteIfExists(schemaPath(ident))
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!Files.isDirectory(dir(oldIdent))) throw new NoSuchTableException(oldIdent)
    if (Files.isDirectory(dir(newIdent))) throw new TableAlreadyExistsException(newIdent)
    Files.move(dir(oldIdent), dir(newIdent))
    if (Files.exists(metaPath(oldIdent)))
      Files.move(metaPath(oldIdent), metaPath(newIdent))
    if (Files.exists(schemaPath(oldIdent)))
      Files.move(schemaPath(oldIdent), schemaPath(newIdent))
  }

  // -- namespaces (databases) ----------------------------------------
  // The reference creates databases explicitly (CatalogClient
  // createDatabase); here a namespace exists iff it holds sets or was
  // explicitly created (".db" marker), mirroring that without a server.

  private def marker(ns: String) = Paths.get(root, s"$ns.db")

  private def dbs: Seq[String] =
    Files.list(Paths.get(root)).iterator().asScala
      .map(_.getFileName.toString)
      .collect {
        case n if n.endsWith(".db") => n.stripSuffix(".db")
        case n if Files.isDirectory(Paths.get(root, n)) && n.contains(".") =>
          n.split("\\.", 2)(0)
      }
      .toSeq.distinct.sorted

  override def listNamespaces(): Array[Array[String]] =
    dbs.map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    // SupportsNamespaces contract: an existing leaf namespace has no
    // children — return empty, don't error (SHOW NAMESPACES IN graft.db)
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && dbs.contains(namespace(0))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit = {
    require(namespace.length == 1, "graft catalog namespaces are single-level")
    Files.writeString(marker(namespace(0)), "")
  }

  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val tables = listTables(namespace)
    if (tables.nonEmpty && !cascade)
      throw new IllegalStateException(
        s"namespace ${namespace(0)} is not empty; use CASCADE")
    tables.foreach(dropTable)
    Files.deleteIfExists(marker(namespace(0)))
    true
  }
}
