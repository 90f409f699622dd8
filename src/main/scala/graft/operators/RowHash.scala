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
    * same rows hash the same on any engine) folded TWO ways, both
    * commutative/associative — identical for any partitioning, row
    * order, or file layout:
    *
    *   - `checksum`: XOR fold. Blind to even-multiplicity changes (a
    *     row duplicated while an equal XOR mass is dropped cancels).
    *   - `checksum_add`: modular SUM fold (mod [[graft.functions
    *     .TextAnalysis.FpMod]]). Sums see multiplicity, so duplicate /
    *     dropped-pair corruption that XOR cannot catch shifts the sum;
    *     together with `n_rows` the pair detects every single-row and
    *     every paired-duplicate change.
    *
    * The additive fold is TWO-LEVEL modular on the Spark side: a
    * per-residue partial sum (`pmod(fp, 1024)` groups — the inner agg
    * is map-side combinable and its exchange carries ≤ 1024 rows)
    * reduced mod FpMod, then the outer sum of ≤ 1024 bounded partials.
    * Why not one `sum(fp)`: fp < FpMod ≈ 2^30, so a single ungrouped
    * sum overflows Long past ~2^33 rows — and Spark 4's ANSI default
    * makes that a runtime error, not a wrap. The bucketed form is exact
    * `sum(fp) mod FpMod` and safe to ~2^43 rows per residue class
    * (hash-balanced), i.e. effectively unbounded. Still one pass over
    * the data; the second aggregate is over ≤ 1024 rows.
    * Output: one row (n_rows, checksum, checksum_add).
    */
  def contentChecksum(df: DataFrame,
                      ignoreColumns: Set[String] = Set.empty): DataFrame = {
    val FpMod = graft.functions.TextAnalysis.FpMod
    withHashColumn(df, "_row_h", ignoreColumns)
      .select(graft.functions.TextAnalysis.fingerprint(col("_row_h")).as("_fp"))
      .groupBy(pmod(col("_fp"), lit(1024L)).as("_r"))
      .agg(count(lit(1)).as("_n"), expr("bit_xor(_fp)").as("_x"),
        (sum(col("_fp")) % FpMod).as("_s"))
      .agg(coalesce(sum(col("_n")), lit(0L)).as("n_rows"),
        expr("bit_xor(_x)").as("checksum"),
        (sum(col("_s")) % FpMod).as("checksum_add"))
  }
}
