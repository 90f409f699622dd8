package graft

/** Scratch smoke main for the verify recipe step 4 — delete after use. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n")
    assert(n > 0, "flagship entry must return rows")
    spark.stop()
  }
}
