package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** One shared local session for the whole suite (per-suite sessions would
  * dominate test wall-time). UTC + small shuffle parallelism, like the
  * driver harness.
  */
trait SparkTestBase { this: Suite =>
  lazy val spark: SparkSession = SparkTestBase.session
  lazy val sf: String = "/root/testdata/sf0.001"
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = Engine.session("local[4]", 4)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
