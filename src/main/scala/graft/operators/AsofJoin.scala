package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single most recent right row with
  * `right.ts <= left.ts` on the same key (the time-series point-in-time
  * lookup Spark has no built-in operator for; DuckDB spells it
  * `ASOF JOIN`, which is exactly what the oracle uses).
  *
  * Implementation is the union-and-carry formulation, NOT a range join:
  * tag both inputs, union them, and within each key carry the latest
  * right payload forward over a (ts, side) sort — `last(payload,
  * ignoreNulls)` over rows UNBOUNDED PRECEDING‥CURRENT. Right rows sort
  * before left rows on timestamp ties, making the match inclusive
  * (`>=`), like DuckDB's default.
  *
  * Scale shape: ONE hash exchange on the key + one sort — the same cost
  * as any sort-merge join, linear in |L| + |R|. The naive alternative
  * (theta-join on `l.ts >= r.ts` + per-left-row top-1) is a
  * BroadcastNestedLoopJoin that goes quadratic per key; this never
  * materializes a candidate pair at all.
  *
  * The payload travels as ONE struct column, so every payload field is
  * taken from the SAME right row (per-column `last()` calls could mix
  * rows when payload fields are null). Right rows must be unique per
  * (key, ts) for a deterministic result — pre-collapse duplicates with
  * `max_by` (the gate query does; ties would otherwise be
  * execution-order-dependent in both engines).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payloadCols: Seq[String],
               outPrefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    // Fail fast instead of silently corrupting the union/window logic:
    // the internal tag columns are reserved, and payload names may not
    // collide with non-key left columns (both sides would claim the slot
    // in the unioned schema).
    val reserved = Set("_side", "_asof_p", "_asof_match")
    val clash = (leftCols ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"asofJoin reserves column names ${reserved.mkString(", ")}; " +
        s"rename input columns: ${clash.distinct.mkString(", ")}")
    val overlap = payloadCols.filter(c => leftCols.contains(c) && !keys.contains(c) && c != tsCol)
    require(overlap.isEmpty,
      s"payload columns ${overlap.mkString(", ")} also exist on the left " +
        "input — rename one side (the union would merge them)")
    val leftOnly = leftCols.filterNot(c => keys.contains(c) || c == tsCol)

    val lSide = left.select(
      leftCols.map(col) ++
        Seq(lit(1).as("_side"),
          lit(null).cast(org.apache.spark.sql.types.StructType(
            payloadCols.map(c => org.apache.spark.sql.types.StructField(
              c, right.schema(c).dataType, nullable = true))))
            .as("_asof_p")): _*)
    val rSide = right.select(
      (keys :+ tsCol).map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("_side"),
          struct(payloadCols.map(col): _*).as("_asof_p")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide)
      .withColumn("_asof_match", last(col("_asof_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"_asof_match.$c").as(s"$outPrefix$c")): _*)
  }

  /** DuckDB oracle builder: native `ASOF LEFT JOIN` over the same
    * pre-collapsed right relation. `leftRel`/`rightRel` are relation SQL
    * (table names or parenthesized subqueries).
    */
  def duckAsofJoin(leftRel: String, rightRel: String, keys: Seq[String],
                   tsCol: String, leftOutCols: Seq[String],
                   payloadCols: Seq[String], outPrefix: String = "asof_"): String = {
    val on = (keys.map(k => s"l.$k = r.$k") :+ s"l.$tsCol >= r.$tsCol")
      .mkString(" AND ")
    val outs = (leftOutCols.map(c => s"l.$c") ++
      payloadCols.map(c => s"r.$c AS $outPrefix$c")).mkString(", ")
    s"SELECT $outs FROM $leftRel l ASOF LEFT JOIN $rightRel r ON $on"
  }
}
