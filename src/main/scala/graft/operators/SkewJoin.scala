package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: when one join key holds a
  * disproportionate share of the fact side (the celebrity user, the
  * null-ish default key, the one hot partkey), a plain hash join sends
  * that key's entire volume to ONE reducer — the straggler that
  * defines the job's wall-clock at 100 TB. Salting splits each key's
  * rows across `nSalt` shuffle partitions by widening the join key
  * with a deterministic per-row salt, and replicates the (small,
  * un-skewed) side once per salt value, so the result is IDENTICAL to
  * the plain join while the heaviest reducer shrinks by ~nSalt×.
  *
  * This is the manual complement to AQE's skew-join split (which only
  * kicks in for sort-merge joins past size thresholds): deterministic,
  * planner-independent, and usable under a `shuffle_hash` hint.
  *
  * The salt derives from `xxhash64` of a fact-side column (any column
  * with per-row variety under a hot key — a row id, a timestamp), so
  * it is deterministic per row: re-runs produce identical partition
  * assignments, and the oracle (the UNSALTED join) proves result
  * equality.
  */
object SkewJoin {

  /** Join `facts` with `dim` on `key`, salted `nSalt` ways. The dim
    * side is hinted to `shuffle_hash` — the demonstration target is
    * the salted exchange; with broadcast the salt would be moot (and a
    * broadcast-able dim needs no salting in the first place).
    */
  def salted(facts: DataFrame, dim: DataFrame, key: String,
             saltSrcCol: String, nSalt: Int): DataFrame = {
    require(nSalt > 0, s"salted: nSalt must be positive, got $nSalt")
    val f = facts.withColumn("_salt",
      pmod(xxhash64(col(saltSrcCol)), lit(nSalt.toLong)))
    val d = dim.withColumn("_salt",
        explode(sequence(lit(0L), lit(nSalt - 1L))))
      .hint("shuffle_hash")
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }
}
