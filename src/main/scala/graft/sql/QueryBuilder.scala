package graft.sql

import graft.sources.SqlSource

/** SQL-string parity layer: reproduces the reference's generated SQL
  * byte-for-byte (build_query, export.py:131–190), unit-tested against the
  * same golden strings its own tests assert (tests/test_export.py:76–209).
  *
  * This layer exists for contract parity only — the primary execution path
  * is the DataFrame planner in [[graft.operators.Sync]]; these strings are
  * also directly runnable via `spark.sql` against registered views.
  */
object QueryBuilder {

  /** generate_filter (export.py:19–28). */
  def generateFilter(nonNullableColumns: String): String =
    if (nonNullableColumns == null || nonNullableColumns.isEmpty) ""
    else nonNullableColumns.split(",", -1)
      .map(f => s"$f IS NOT NULL AND $f != ''")
      .mkString(" AND ")

  def full(tableRef: String, nonNullableColumns: String = ""): String = {
    val cond = generateFilter(nonNullableColumns)
    val base = s"SELECT * FROM $tableRef"
    if (cond.nonEmpty) s"$base WHERE $cond" else base
  }

  def timeBased(tableRef: String, updatedTimeColumn: String, timeCutoffMs: Long,
                nonNullableColumns: String = "", delayMs: Long = 0, nowMs: Long = 0): String = {
    val cond = generateFilter(nonNullableColumns)
    var q = s"SELECT * FROM $tableRef WHERE unix_timestamp($updatedTimeColumn)*1000 >= $timeCutoffMs"
    if (cond.nonEmpty) q += s" AND $cond"
    if (delayMs > 0 && nowMs > 0) {
      val upper = nowMs - delayMs
      q += s" AND unix_timestamp($updatedTimeColumn)*1000 <= $upper"
    }
    q
  }

  def scdLatest(tableRef: String, groupIdColumn: String, scdTimeColumn: String,
                nonNullableColumns: String = ""): String = {
    if (groupIdColumn == null || groupIdColumn.isEmpty ||
        scdTimeColumn == null || scdTimeColumn.isEmpty)
      throw new IllegalArgumentException(
        "scd-latest sync requires --group_id_column and --scd_time_column")
    val cond = generateFilter(nonNullableColumns)
    val where = if (cond.nonEmpty) s" WHERE $cond" else ""
    s"""SELECT *
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY $groupIdColumn ORDER BY $scdTimeColumn DESC) AS row_num
    FROM $tableRef$where
) RankedRows
WHERE row_num = 1"""
  }

  /** CDC first sync — time-travel snapshot (export.py:112–114). */
  def cdcFirstSync(tableRef: String, endMs: Long): String =
    s"SELECT 'INSERT' as _mp_change_type, * FROM $tableRef TIMESTAMP AS OF '${SqlSource.msToIso(endMs)}'"

  /** CDC incremental — table_changes with CASE mapping (export.py:115–128);
    * exclusive start via `cutoff + 1 ms`.
    */
  def cdcIncremental(tableRef: String, timeCutoffMs: Long, endMs: Long): String = {
    val start = SqlSource.msToIso(timeCutoffMs + 1)
    val end = SqlSource.msToIso(endMs)
    s"""
    SELECT CASE
        WHEN _change_type = 'update_postimage' THEN 'INSERT'
        WHEN _change_type = 'update_preimage' THEN 'DELETE'
        WHEN _change_type = 'insert' THEN 'INSERT'
        ELSE 'DELETE'
    END as _mp_change_type, *
    FROM table_changes('$tableRef', '$start', '$end')
    """
  }

  /** Resolve `:name` params into the string for reporting, like the
    * reference's final notebook-exit payload (export.py:330–332).
    */
  def resolveParams(query: String, params: Map[String, Any]): String =
    params.foldLeft(query) { case (q, (k, v)) => q.replace(s":$k", s"'$v'") }
}
