package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Scale-rehearsal probe for the dedup/ANN HEADLINERS at large
  * multipliers (the BASELINE.md 100× table): times
  * [[Dedup.minhashLshPairs]] (banded equi-join + exact verification)
  * with its cap-drop census, and [[Similarity.ivfTopK]] (coarse k-means
  * cells + nProbe-bounded exact search) with a FIXED 1000-query batch so
  * the timing isolates corpus growth — the production shape is a bounded
  * query batch probing an arbitrarily large corpus.
  *
  * Expected scale shapes: minhash is one signature pass (narrow,
  * codegen'd [[graft.functions]] MinHashSig) + a band-keyed exchange
  * whose skew is bounded by the bucket cap — wall should grow ~linearly
  * with docs while the cap-drop census reports what the bound cost.
  * IVF train is per-iteration one corpus pass + a k-sized aggregate;
  * probe is (queries × nProbe cells) of exact scoring, so at fixed
  * queries the probe grows with corpus/k per cell — linear in corpus.
  *
  * Usage: `runMain graft.RehearseHeadliners <fixtureDir> [minhash|ivf]...`
  * (fixtureDir from [[MakeScaleFixture]]; default runs both probes).
  */
object RehearseHeadliners {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RehearseHeadliners <fixtureDir> [minhash|ivf]...")
    val dir = args(0)
    val modes = if (args.length > 1) args.drop(1).toSeq else Seq("minhash", "ivf")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    modes.foreach {
      case "minhash" =>
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val nDocs = docs.count()
        val (pairs, sec) = time(Dedup.minhashLshPairs(
          docs, "text", "doc_id", n = 3, bands = 42, rowsPerBand = 3,
          threshold = 0.5).count())
        // Cap-drop census at the same parameters: the recall cost the
        // bucket bound paid, reported next to the wall it bought.
        val drop = Dedup.lshCapDropCount(docs, "text", "doc_id",
          n = 3, bands = 42, rowsPerBand = 3).head()
        val (dropped, total) = (drop.getLong(0), drop.getLong(1))
        println(f"""{"mode":"minhash","docs":$nDocs,"pairs":$pairs,"sec":$sec%.2f,"cap_dropped_rows":$dropped,"band_rows":$total,"drop_rate":${dropped.toDouble / math.max(total, 1L)}%.6f}""")
      case "ivf" =>
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val nVecs = emb.count()
        val (corpus, trainSec) = time {
          val cells = Similarity.kmeansCells(emb, "embedding", "vec_id",
            k = 32, iters = 3)
          val c = emb.join(cells, "vec_id")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          c.count()
          c
        }
        val queries = corpus.filter(col("vec_id") < 1000)
        val (hits, probeSec) = time(Similarity.ivfTopK(
          corpus, queries, "embedding", "vec_id", "cell",
          k = 10, nProbe = 4).count())
        corpus.unpersist(blocking = false)
        println(f"""{"mode":"ivf","vectors":$nVecs,"k":32,"train_sec":$trainSec%.2f,"queries":1000,"topk_rows":$hits,"probe_sec":$probeSec%.2f}""")
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
