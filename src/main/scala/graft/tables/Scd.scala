package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD helpers: `scd2Merge` (reference staged-merge pattern
  * `DP/Step 12:159-236`) and `applyChanges` (DLT APPLY CHANGES INTO,
  * `CDC/01-Retail_DLT_CDC_SQL.sql:152-199`, `DP/Step 3:104-118`).
  *
  * Both dedupe the incoming batch to the latest row per key first
  * (ROW_NUMBER over `sequenceBy` desc) — the canonical idiom — then drive
  * one MERGE, so the heavy lifting (file pruning, keyed shuffle) is
  * MergeOps'.
  */
object Scd {

  /** SCD2 merge: expire changed current rows, insert new versions.
    *
    * Target schema = business columns ++ (startCol, endCol, currentCol),
    * where startCol/endCol take the type of `seqCol` in `updates`.
    * Change detection compares `compareCols`.
    */
  def scd2Merge(
      t: GraftTable,
      updates: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String],
      seqCol: String,
      startCol: String = "_start_at",
      endCol: String = "_end_at",
      currentCol: String = "_is_current"): Commit = {
    // latest row per key. (Deliberately NOT cached: measured at sf0.1,
    // persisting this small deduped batch costs more in columnar cache
    // build than the recompute it saves; Catalyst reuses the window's
    // shuffle across the consuming jobs.)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    val latest = updates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    val keyCond = keys.map(k => s"target.$k = source.$k").mkString(" AND ")
    val diffCond = compareCols
      .map(c => s"NOT (target.$c <=> source.$c)").mkString(" OR ")

    // Stage A (one merge): expire the current row when it changed AND the
    // update is newer than the current version — out-of-order rows older
    // than the applied head are dropped, not retro-chained
    // (`CDC/01:176-184` sequencing guarantee; full retro-insert is out of
    // scope, same as the reference's batch SCD2 pattern).
    MergeOps.mergeInto(
      t, latest,
      condition = s"($keyCond) AND target.$currentCol = true",
      matched = Seq(MergeOps.WhenMatched(
        Some(s"($diffCond) AND source.$seqCol > target.$startCol"),
        MergeOps.UpdateSet(Map(
          endCol -> s"source.$seqCol",
          currentCol -> "false")))),
      notMatched = Nil)

    // Stage B (second merge): insert the new current version for keys whose
    // current row is now absent/expired (covers both changed and new keys).
    // Guarded by the per-key applied-sequence high watermark over ALL
    // history rows (current or not): without it, an out-of-order event
    // older than an applied delete/expiry would find no current row and
    // resurrect the key with a stale sequence. `>=` keeps the normal path
    // alive — stage A just expired the current row AT the source sequence.
    val guarded =
      if (t.filesAt().isEmpty) latest // empty target: nothing applied yet
      else {
        val applied = t.read()
          .join(latest.select(keys.map(col): _*).distinct(), keys, "left_semi")
          .groupBy(keys.map(col): _*)
          .agg(greatest(max(col(startCol)), max(col(endCol))).as("__applied_hw"))
        latest.join(applied, keys, "left")
          .filter(col("__applied_hw").isNull || col(seqCol) >= col("__applied_hw"))
          .drop("__applied_hw")
      }

    val businessCols = t.schemaAt().fieldNames
      .filterNot(Set(startCol, endCol, currentCol).contains)
    val insertAssignments =
      businessCols.map(c => c -> s"source.$c").toMap ++
        Map(startCol -> s"source.$seqCol",
          endCol -> "CAST(NULL AS STRING)",
          currentCol -> "true")
    MergeOps.mergeInto(
      t, guarded,
      condition = s"($keyCond) AND target.$currentCol = true",
      matched = Nil,
      notMatched = Seq(MergeOps.WhenNotMatched(None,
        MergeOps.InsertValues(insertAssignments))))
  }

  /** DLT APPLY CHANGES INTO — SCD1: keep one row per key, newest `sequenceBy`
    * wins, out-of-order rows are ignored, `deleteWhen` rows remove the key.
    * The target carries `sequenceBy` so late-arriving older rows lose
    * against what is already applied (`CDC/01:176-184`).
    */
  def applyChangesScd1(
      t: GraftTable,
      cdc: DataFrame,
      keys: Seq[String],
      sequenceBy: String,
      deleteWhen: Option[String] = None,
      exceptCols: Seq[String] = Nil): Commit = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(sequenceBy).desc)
    val latest = cdc.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .drop(exceptCols: _*)

    val keyCond = keys.map(k => s"target.$k = source.$k").mkString(" AND ")
    val newer = s"source.$sequenceBy >= target.$sequenceBy"
    val cols = t.schemaAt().fieldNames.toSeq

    val matched = Seq(
      deleteWhen.map(d => MergeOps.WhenMatched(
        Some(s"($newer) AND (${qualifySource(d, latest.columns)})"), MergeOps.DeleteAction)),
      Some(MergeOps.WhenMatched(Some(newer),
        MergeOps.UpdateSet(cols.map(c => c -> s"source.$c").toMap)))).flatten
    val notMatched = Seq(MergeOps.WhenNotMatched(
      deleteWhen.map(d => s"NOT (${qualifySource(d, latest.columns)})"),
      MergeOps.InsertValues(cols.map(c => c -> s"source.$c").toMap)))

    MergeOps.mergeInto(t, latest, keyCond, matched, notMatched)
  }

  /** DLT APPLY CHANGES INTO — STORED AS SCD TYPE 2
    * (`CDC/01:152-199` with SCD2 storage, `DP/Step 3:104-118`): history
    * rows chain via startCol/endCol, deletes expire the current row
    * without inserting a successor, out-of-order rows lose to the applied
    * head.
    */
  def applyChangesScd2(
      t: GraftTable,
      cdc: DataFrame,
      keys: Seq[String],
      sequenceBy: String,
      deleteWhen: Option[String] = None,
      exceptCols: Seq[String] = Nil,
      startCol: String = "_start_at",
      endCol: String = "_end_at",
      currentCol: String = "_is_current"): Unit = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(sequenceBy).desc)
    val latest = cdc.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .drop(exceptCols.filterNot(_ == sequenceBy): _*)

    val (deletes, upserts) = deleteWhen match {
      case Some(d) => (latest.filter(expr(d)), latest.filter(not(expr(d))))
      case None => (null, latest)
    }

    val businessCols = t.schemaAt().fieldNames
      .filterNot(Set(startCol, endCol, currentCol).contains)
    val compareCols = businessCols.filterNot(keys.contains).toSeq

    if (deletes != null && !deletes.isEmpty) {
      val keyCond = keys.map(k => s"target.$k = source.$k").mkString(" AND ")
      MergeOps.mergeInto(
        t, deletes,
        condition = s"($keyCond) AND target.$currentCol = true",
        matched = Seq(MergeOps.WhenMatched(
          Some(s"source.$sequenceBy > target.$startCol"),
          MergeOps.UpdateSet(Map(
            endCol -> s"source.$sequenceBy",
            currentCol -> "false")))),
        notMatched = Nil)
    }
    if (!upserts.isEmpty)
      scd2Merge(t, upserts, keys, compareCols, sequenceBy, startCol, endCol, currentCol)
  }

  /** Qualify bare column references in a user predicate with `source.` so
    * it is unambiguous inside the merge join. */
  private def qualifySource(pred: String, sourceCols: Seq[String]): String =
    sourceCols.sortBy(-_.length).foldLeft(pred) { (p, c) =>
      p.replaceAll(s"(?<![\\w.])$c(?![\\w])", s"source.$c")
    }
}
