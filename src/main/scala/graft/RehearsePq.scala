package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Pq, Similarity}

/** Scale-rehearsal probe for ANN index TRAINING (BASELINE.md): times
  * [[Pq.pqModel]] (product-quantizer codebooks, m sub-spaces × ksub
  * centroids, distributed Lloyd) and [[Similarity.kmeansCells]] (IVF
  * coarse cells) on a [[MakeScaleFixture]] embeddings corpus at two
  * multipliers. Expected shape: per iteration, ONE corpus pass
  * (assign) + one centroid aggregate whose exchange is
  * centroid-count-sized; the codebook collect is driver metadata
  * (m·ksub·subLen doubles). Time should grow ~linearly with vectors at
  * fixed iterations — a super-linear stage means an assignment join or
  * exchange picked up corpus-sized state.
  *
  * Usage: `runMain graft.RehearsePq <fixtureDir> [iters]`
  */
object RehearsePq {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RehearsePq <fixtureDir> [iters]")
    val dir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVecs = emb.count()
    val t0 = System.nanoTime()
    val (codes, _) = Pq.pqModel(emb, "embedding", "vec_id",
      dim = 64, m = 8, ksub = 16, iters = iters)
    val nCodes = codes.count()
    val pqSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val cells = Similarity.kmeansCells(emb, "embedding", "vec_id",
      k = 32, iters = iters)
    val nCells = cells.count()
    val ivfSec = (System.nanoTime() - t1) / 1e9
    println(f"""{"vectors":$nVecs,"iters":$iters,"pq_codes":$nCodes,"pq_sec":$pqSec%.2f,"ivf_assigned":$nCells,"ivf_sec":$ivfSec%.2f}""")
    spark.stop()
  }
}
