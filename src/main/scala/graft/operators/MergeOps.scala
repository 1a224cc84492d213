package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lakehouse-style change application (MERGE / CDC upsert) over immutable
  * snapshots. The reference engine's storage is append-only sets with
  * whole-set removal (reference: src/storage/headers/PangeaStorageServer.h
  * — addSet/removeSet, no in-place update); a user updating records
  * rewrites the set. This operator is that rewrite expressed as one
  * relational plan, the way table formats without transactional metadata
  * layers apply a change batch.
  *
  * Scale design: one shuffle each side. `base ANTI JOIN changes` removes
  * every touched key (update and delete alike) in a single hash join —
  * broadcast when the change batch is small (the common CDC case, hinted
  * here), shuffle-hash otherwise — then surviving inserts/updates union
  * in column order. No window, no driver state; the output is a straight
  * rewrite partitioned like the anti join's left side.
  */
object MergeOps {

  /** Apply `changes` (base schema + `opCol` ∈ {'I','U','D'}) to `base`.
    * Semantics: D removes the key, U replaces the row, I adds it. Exactly
    * one change row per key is assumed (standard compacted-CDC contract);
    * enforcing it is a groupBy the caller owns.
    */
  def applyChanges(
      base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      opCol: String = "op",
      broadcastChanges: Boolean = true): DataFrame = {
    val keys = changes.select(keyCols.map(col): _*)
    val keep = base.join(
      if (broadcastChanges) broadcast(keys) else keys, keyCols, "left_anti")
    val applied = changes.filter(col(opCol) =!= "D")
      .select(base.columns.map(col).toSeq: _*)
    keep.unionByName(applied)
  }
}
