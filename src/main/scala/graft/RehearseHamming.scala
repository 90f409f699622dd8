package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Multimodal

/** Scale-rehearsal probe for the pigeonhole-banded hamming join behind
  * [[graft.operators.Dedup.hammingPairs]] / `q_mm_phash_dedup`
  * (BASELINE.md "Hamming-banding scale rehearsal"): times
  * `Multimodal.phashNearDup` on a [[MakeScaleFixture]] documents corpus
  * and prints one JSON line.
  *
  * The interesting scale property is NEGATIVE and worth measuring: a
  * 32-bit fingerprint at radius 3 has only 4×2⁸ bucket keys, so bucket
  * occupancy grows like n/256 and within-bucket candidate volume like
  * n²/256 — the banded join is linear in the corpus only until the key
  * space saturates (~250 k distinct signatures against the 1024-row
  * bucket cap; beyond that the cap drops rows and publishes the
  * `graft.lsh_bucket_drops` metric). The production mitigations are
  * documented in BASELINE.md: wider fingerprints (64-bit pHash over
  * real rasters → 2¹⁶ keys per chunk, the SimHash regime) or a smaller
  * verified radius.
  *
  * Usage: `runMain graft.RehearseHamming <docsDir> [maxHamming]`
  * (docsDir contains documents.parquet; default radius 3).
  */
object RehearseHamming {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RehearseHamming <docsDir> [maxHamming]")
    val dir = args(0)
    val radius = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val pairs = Multimodal.phashNearDup(
      Multimodal.attachBinary(docs, "text"), "doc_id", maxHamming = radius)
    val n = pairs.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"docs":$nDocs,"radius":$radius,"pairs":$n,"sec":$sec%.2f}""")
    spark.stop()
  }
}
