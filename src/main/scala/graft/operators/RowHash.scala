package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic row hashing — the reference's computed-hash column
  * (export.py:204–214): `md5(to_json(struct(<sorted non-ignored cols>)))`.
  *
  * Column names are sorted (export.py:209) so the hash is independent of
  * schema order; `to_json` omits null fields, which makes the hash
  * null-vs-absent insensitive (a property the reference inherits and
  * downstream consumers rely on for change detection).
  *
  * The reference has two bugs here that we implement around (SURVEY §2.3):
  * its whitespace-`split()` of the ignore list means the hash is only added
  * when ignore columns are supplied, and its substring membership test
  * drops any column whose name is a substring of the raw ignore string.
  * Evident intent, implemented here: if `hashCol` is non-empty, append
  * `md5(to_json(struct(sorted(columns − ignore))))` with `ignore` as an
  * exact-name set.
  *
  * Physical note: this is a narrow, codegen'd projection — it pipelines
  * into the write stage with no shuffle (SURVEY §4.3).
  */
object RowHash {
  def withHashColumn(df: DataFrame, hashCol: String,
                     ignoreColumns: Set[String] = Set.empty): DataFrame = {
    if (hashCol.isEmpty) df
    else {
      val cols = df.columns.filterNot(ignoreColumns.contains).sorted
      df.withColumn(hashCol, md5(to_json(struct(cols.map(col): _*))))
    }
  }

  /** ORDER-INDEPENDENT dataset content checksum — "did the sync land
    * bit-exact" verified without moving, sorting, or comparing data:
    * per-row deterministic hash (the reference's P4 render, so the
    * same rows hash the same on any engine) folded by XOR, which is
    * commutative/associative — the checksum is identical for any
    * partitioning, row order, or file layout, and two datasets agree
    * iff source and sink hold the same row multiset (up to XOR's
    * paired-duplicate blind spot, which `n_rows` plus the md5-derived
    * 60-bit space makes practically inert). One narrow codegen'd
    * projection + one map-side-combined aggregate per side.
    * Output: one row (n_rows, checksum).
    */
  def contentChecksum(df: DataFrame,
                      ignoreColumns: Set[String] = Set.empty): DataFrame =
    withHashColumn(df, "_row_h", ignoreColumns)
      .select(graft.functions.TextAnalysis.fingerprint(col("_row_h")).as("_fp"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(_fp)").as("checksum"))
}
