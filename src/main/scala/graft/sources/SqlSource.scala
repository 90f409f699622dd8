package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6/S7 — user-supplied custom SQL with named parameters
  * (export.py:70–100, 203).
  *
  * The reference resolves `/Workspace/External/mixpanel/{project}/queries/
  * {catalog}/{schema}/{table}/{initial|recurring}_query.sql` via dbutils;
  * here the base directory is a parameter and plain `java.nio` replaces the
  * Databricks-only workspace FS. File choice: `initial_query.sql` when the
  * watermark is 0 (first sync), `recurring_query.sql` otherwise
  * (export.py:81).
  *
  * Execution uses Spark 4 named-parameter SQL — `spark.sql(text, args)` —
  * exactly the reference's `spark.sql(query, args=query_params)`
  * (export.py:203): parameters `:end_timestamp` (always) and
  * `:start_timestamp` (recurring only, `cutoff + 1 ms` exclusive start,
  * export.py:91–98).
  */
object SqlSource {

  /** ms-epoch → ISO-8601 UTC string, matching the reference's
    * `ms_to_datetime(...).isoformat()` (export.py:9–11, 95–98): whole
    * seconds render with no fraction (`2024-01-01T12:00:00+00:00`),
    * anything else with Python's 6-digit microseconds
    * (`2024-01-01T12:00:00.124000+00:00` — asserted at
    * tests/test_export.py:196).
    */
  def msToIso(ms: Long): String =
    Instant.ofEpochMilli(ms).atOffset(ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern(
        if (ms % 1000 == 0) "yyyy-MM-dd'T'HH:mm:ssxxx"
        else "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx"))

  def queryPath(baseDir: String, project: String, catalog: String,
                schema: String, table: String, timeCutoffMs: Long): Path = {
    val filename = if (timeCutoffMs == 0) "initial_query.sql" else "recurring_query.sql"
    Paths.get(baseDir, project, "queries", catalog, schema, table, filename)
  }

  /** Load the SQL text + named params. Throws `FileNotFoundException` with
    * the reference's message shape when the file is absent
    * (export.py:84–87).
    */
  def load(path: Path, timeCutoffMs: Long, endMs: Long): (String, Map[String, Any]) = {
    if (!Files.exists(path))
      throw new java.io.FileNotFoundException(s"Custom SQL query file not found: $path")
    val text = Files.readString(path)
    val params = Map("end_timestamp" -> msToIso(endMs)) ++
      (if (timeCutoffMs > 0) Map("start_timestamp" -> msToIso(timeCutoffMs + 1)) else Map.empty)
    (text, params)
  }

  def run(spark: SparkSession, sqlText: String, params: Map[String, Any]): DataFrame =
    spark.sql(sqlText, params)
}
