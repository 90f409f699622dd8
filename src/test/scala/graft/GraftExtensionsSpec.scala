package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{FileSink, SinkSpec}

class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("graft_dot is callable from SQL text via SparkSessionExtensions") {
    // Force the shared context to build a NEW session so withExtensions
    // applies (getOrCreate returns the active session otherwise).
    val base = spark // materialize the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .getOrCreate()
    try {
      val got = s2.sql(
        "SELECT graft_dot(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS d")
        .head().getDouble(0)
      assert(got == 32.0)
      val sig = s2.sql("SELECT graft_simhash64(array(CAST(7 AS BIGINT))) AS s")
        .head().getLong(0)
      assert(sig == 7L) // single hash votes its own bits
      val keys = s2.sql(
        "SELECT graft_sign_lsh_keys(array(1.0F, 0.0F), 2, 4, 3) AS k")
        .head().getSeq[Long](0)
      assert(keys.length == 3)
      val mh = s2.sql("SELECT graft_minhash_sig(array('a', 'b'), 4) AS m")
        .head().getSeq[Long](0)
      assert(mh.length == 4 && mh.forall(_ != Long.MaxValue))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("csv sink fails fast on nested columns with an actionable message") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2))).toDF("id", "xs")
    val e = intercept[IllegalArgumentException](
      FileSink.write(df, SinkSpec("csv", "/tmp/graft-nope")))
    assert(e.getMessage.contains("xs"))
    assert(e.getMessage.contains("json sink"))
  }
}
