package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without an equi key — "which points fall inside
  * which windows" when the windows belong to no shared partitioning
  * column. Catalyst plans the naive `p.ts >= i.start AND p.ts < i.end`
  * predicate as a BroadcastNestedLoopJoin: O(|P|·|I|) comparisons, the
  * classic 100 TB cliff.
  *
  * The scale path bucketizes time: every point lands in exactly one
  * `bucketUs`-wide bucket, every interval is exploded to the buckets it
  * overlaps, and the join becomes a bucket-key EQUI-join followed by the
  * exact containment filter. Cost: |P| + Σ(interval span / bucket) join
  * rows, one hash exchange each side — linear, shuffle-partitioned, and
  * each (interval, point) pair meets in exactly one bucket (the point's),
  * so no dedup pass is needed.
  *
  * Pick `bucketUs` ≈ the typical interval length: shorter buckets explode
  * intervals wider; longer buckets fatten bucket population (more exact-
  * filter work). Both inputs carry their columns through — rename before
  * calling on name collisions.
  */
object RangeJoin {

  /** `points` with µs-epoch column `pUsCol`; `intervals` with µs-epoch
    * `[startUsCol, endUsCol)` bounds. Inner join semantics. `keys`
    * names columns present on BOTH sides that must also match (e.g. the
    * user id for per-entity windows) — they join as additional equi
    * keys, so cross-entity bucket collisions never materialize.
    */
  def bucketedIntervalJoin(points: DataFrame, pUsCol: String,
                           intervals: DataFrame, startUsCol: String,
                           endUsCol: String, bucketUs: Long,
                           keys: Seq[String] = Nil): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val p = points.withColumn("_b", floor(col(pUsCol) / bucketUs))
    val i = intervals
      .filter(col(endUsCol) > col(startUsCol)) // empty intervals match nothing
      .withColumn("_b", explode(sequence(
        floor(col(startUsCol) / bucketUs),
        floor((col(endUsCol) - 1) / bucketUs))))
    p.join(i, "_b" +: keys)
      .filter(col(pUsCol) >= col(startUsCol) && col(pUsCol) < col(endUsCol))
      .drop("_b")
  }
}
