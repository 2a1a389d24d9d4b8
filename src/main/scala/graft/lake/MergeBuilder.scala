package graft.lake

import org.apache.spark.sql.{Column, DataFrame}

/** Fluent conditional-MERGE builder (Delta-style clause surface):
  *
  * {{{
  * table.mergeBuilder(src, "id")
  *   .whenMatchedDelete(col("status") === "tombstone")
  *   .whenMatchedUpdateAll()
  *   .whenNotMatchedInsertAll()
  *   .execute()
  * }}}
  *
  * Clause semantics: matched rows meeting the delete condition are
  * removed; remaining matched rows are replaced by the source row when
  * update is enabled (and its optional condition holds on the target
  * row); unmatched source rows are inserted when insert is enabled.
  */
final class MergeBuilder private[lake] (t: GraftTable, source: DataFrame, key: String) {
  private var updateAll = true
  private var updateCond: Option[Column] = None
  private var deleteCond: Option[Column] = None
  private var insertUnmatched = true

  def whenMatchedUpdateAll(condition: Option[Column] = None): MergeBuilder = {
    updateAll = true; updateCond = condition; this
  }
  def whenMatchedKeep(): MergeBuilder = { updateAll = false; updateCond = None; this }
  def whenMatchedDelete(condition: Column): MergeBuilder = {
    deleteCond = Some(condition); this
  }
  def whenNotMatchedInsertAll(): MergeBuilder = { insertUnmatched = true; this }
  def whenNotMatchedIgnore(): MergeBuilder = { insertUnmatched = false; this }

  def execute(): Map[String, String] =
    t.executeMerge(source, key, updateAll, updateCond, deleteCond, insertUnmatched)
}
