package graft.api.classic

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import graft.storage.SetCatalog

/** The reference's first-generation ("classic") query API — deprecated
  * there in favor of the Computation graph, but still part of the public
  * surface (reference: src/queries/headers/Query.h:15, Join.h:14,
  * QueryBase.h, SetIterator.h, QueryClient.h). Semantics are identical to
  * the Computation operators (SURVEY.md §2.1 row "Classic deprecated
  * API"), so this is a thin typed veneer compiled to the same Dataset
  * plans:
  *  - [[QueryBase]] carries the output (db, set) naming and input wiring
  *    (QueryBase.h setDBName/setSetName, getIthInput);
  *  - [[Selection]] = getSelection filter + getProjection map;
  *  - [[Join]] = boolean selection over both inputs + projection. The
  *    classic engine had no equi-key recognition (that arrived with
  *    JoinComp's lambda analysis), so this compiles the opaque route:
  *    cross + filter — Catalyst still plans a BNLJ/cartesian exactly as
  *    the reference's classic processor scanned pairs. Use the
  *    Computation API's equiJoin for hash-join plans.
  *  - [[QueryClient]] executes sink queries into catalog sets and hands
  *    back a [[QueryClient.getSetIterator]] (SetIterator.h result fetch).
  */
abstract class QueryBase[Out] extends Serializable {
  // Serializable: classic query objects ship their lambdas to executors,
  // exactly as every reference query is a deep-copyable pdb::Object
  private[classic] var outDb: String = ""
  private[classic] var outSet: String = ""

  /** QueryBase.h setDBName + setSetName */
  def setOutput(db: String, set: String): Unit = { outDb = db; outSet = set }

  /** "selection", "join", "set" — QueryBase.h getQueryType */
  def queryType: String

  private[classic] def compile(client: QueryClient): Dataset[Out]
}

/** a stored input set — the classic API's scan leaf */
final case class InputSet[T](db: String, set: String)(implicit enc: Encoder[T])
    extends QueryBase[T] {
  override def queryType: String = "set"
  override private[classic] def compile(client: QueryClient): Dataset[T] =
    client.catalog.scanSet(db, set).as[T]
}

/** classic Selection: users subclass and supply the two lambdas */
abstract class Selection[In, Out](implicit inEnc: Encoder[In], outEnc: Encoder[Out])
    extends QueryBase[Out] {
  private[classic] var input: QueryBase[In] = _
  def setInput(q: QueryBase[In]): Unit = input = q

  def getSelection(in: In): Boolean
  def getProjection(in: In): Out

  override def queryType: String = "selection"
  override private[classic] def compile(client: QueryClient): Dataset[Out] = {
    require(input != null, "selection input not set")
    input.compile(client).filter(getSelection _).map(getProjection _)
  }
}

/** classic binary Join: boolean selection over the pair + projection */
abstract class Join[Out, In1, In2](implicit
    in1Enc: Encoder[In1], in2Enc: Encoder[In2], outEnc: Encoder[Out])
    extends QueryBase[Out] {
  private[classic] var input1: QueryBase[In1] = _
  private[classic] var input2: QueryBase[In2] = _
  def setInput(q1: QueryBase[In1], q2: QueryBase[In2]): Unit = {
    input1 = q1; input2 = q2
  }

  def getSelection(in1: In1, in2: In2): Boolean
  def getProjection(in1: In1, in2: In2): Out

  override def queryType: String = "join"
  override private[classic] def compile(client: QueryClient): Dataset[Out] = {
    require(input1 != null && input2 != null, "join inputs not set")
    input1.compile(client)
      .joinWith(input2.compile(client), org.apache.spark.sql.functions.lit(true), "cross")
      .filter((p: (In1, In2)) => getSelection(p._1, p._2))
      .map { case (a, b) => getProjection(a, b) }
  }
}

/** classic QueryClient: execute(sinks) materializes each sink query into
  * its declared output set; getSetIterator fetches results
  * (QueryClient.h:131-148, SetIterator.h). Construction heals
  * interrupted staged swaps by MARKER REPLAY only — markers are commit
  * points, so the replay can only finish swaps some session genuinely
  * committed, and a restarted standing pipeline must not serve a crash
  * window. The destructive CONVENTION SWEEP (discarding pre-marker
  * staging leftovers) is NOT run here (ADVICE r16): a QueryClient is
  * also how readers open a root, and a reader's open must never discard
  * a live rebuilder's in-flight staging sets in another session —
  * `sweepStagingOnOpen = true` opts a root-OWNING pipeline into the
  * full sweep (GraftCatalog, which truly owns its root, full-sweeps by
  * default); `recoverOnOpen = false` opts a read-only inspector out of
  * even the marker replay.
  */
final class QueryClient(val spark: SparkSession, root: String,
    recoverOnOpen: Boolean = true, sweepStagingOnOpen: Boolean = false) {
  val catalog = new SetCatalog(spark, root)
  if (recoverOnOpen) catalog.recoverAllDbs(conventionSweep = sweepStagingOnOpen)

  def createSet[T](db: String, set: String, data: Dataset[T]): Unit =
    catalog.createSet(db, set, data.toDF(), None, policy = "none")

  def execute(sinks: QueryBase[_]*): Unit =
    sinks.foreach { q =>
      require(q.outDb.nonEmpty && q.outSet.nonEmpty,
        s"${q.queryType} sink has no output set (call setOutput)")
      catalog.createSet(q.outDb, q.outSet, q.compile(this).toDF(), None, policy = "none")
    }

  def getSetIterator[T](db: String, set: String)(implicit enc: Encoder[T]): Iterator[T] = {
    import scala.jdk.CollectionConverters._
    catalog.scanSet(db, set).as[T].toLocalIterator.asScala
  }
}
