package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR.
  *
  * Protocol: two full iterations, report the per-query MINIMUM across
  * them — the cold pass is dominated by ~10 s of janino codegen + JIT
  * noise (BASELINE.md measured ±3 s/query cold), and this host shows
  * minutes-long external-contention windows that can inflate any single
  * pass 3–5× uniformly (BASELINE.md round 6: the same suite measured
  * 58.6 s and 314 s within half an hour, idle load both times). The
  * min across passes is the standard noise-robust wall-clock estimator;
  * `cold_total` (first-pass sum) is kept for warmup visibility. The
  * JSON line goes to stdout AND `target/bench.json` so the driver need
  * not scrape sbt logs.
  *
  * A query that throws is NOT silently timed as ~0 s: its elapsed time
  * is still recorded and its error surfaces in the `"errors"` JSON map
  * (name → exception class + message), so a broken query is visible in
  * the bench artifact, not just in the correctness gate.
  *
  * `SPARK_GRAFT_BENCH_ONLY=q_a,q_b` restricts the run to the named
  * queries (iteration tool; the driver never sets it).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name))
    }
    def jsonStr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    def runAll(): (Map[String, Double], Map[String, String]) = {
      val errors = Map.newBuilder[String, String]
      val times = selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            errors += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
        }
        val sec = (System.nanoTime() - t0) / 1e9
        // Execution-order trace on stderr (driver parses stdout only):
        // accumulation bugs show as monotonically inflating times here.
        System.err.println(f"[bench] $name%-28s $sec%8.2f s")
        name -> sec
      }
      (times, errors.result())
    }
    val runs = (1 to math.max(1, iters)).map(_ => runAll())
    // Per-query min across passes (noise-robust); errors from the last
    // pass (a query that recovered on retry still shows its best time,
    // one that keeps failing keeps its error).
    val results = runs.map(_._1).reduce((a, b) =>
      a.map { case (k, v) => k -> math.min(v, b.getOrElse(k, v)) })
    val errors = runs.last._2
    val qs = results.map { case (k, v) => jsonStr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val coldTotal = runs.head._1.values.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","iters":${runs.length},"cold_total":$coldTotal}"""
    println(json)
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/bench.json"), json + "\n")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
