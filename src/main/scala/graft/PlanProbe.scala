package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    args.drop(1).foreach { n =>
      println(s"\n========== $n @ $d ==========")
      val df = SparkEntry.queries(n)(spark, d)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
