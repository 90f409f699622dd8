package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class FixtureProbeSpec extends AnyFunSuite with SparkTestBase {

  test("the current fixture satisfies the schema contract at every SF") {
    for (dir <- Seq("sf0.001", "sf0.01")) {
      val ms = FixtureProbe.check(spark, s"/root/testdata/$dir")
      assert(ms.isEmpty, s"$dir: ${ms.mkString("; ")}")
    }
  }

  test("a drifted fixture is diagnosed per-column, not as a generic failure") {
    val tmp = Files.createTempDirectory("probe_drift").toString
    // events with ts re-typed to STRING (an encoding Tables.load cannot
    // adapt to) and `value` dropped — the probe must name both.
    Tables.load(spark, sf, "events")
      .selectExpr("event_id", "cast(ts as string) as ts", "user_id", "event_type", "props")
      .write.parquet(s"$tmp/events.parquet")
    for (t <- Tables.All if t != "events")
      Tables.load(spark, sf, t).limit(1).write.parquet(s"$tmp/$t.parquet")
    val ms = FixtureProbe.check(spark, tmp)
    assert(ms.forall(_.table == "events"), ms.mkString("; "))
    assert(ms.exists(m => m.detail.contains("`ts`") && m.detail.contains("fixture has string")))
    assert(ms.exists(_.detail.contains("`value` missing")))
  }

  test("a missing table reports unreadable with the path, other tables still checked") {
    val tmp = Files.createTempDirectory("probe_missing").toString
    for (t <- Tables.All if t != "region")
      Tables.load(spark, sf, t).limit(1).write.parquet(s"$tmp/$t.parquet")
    val ms = FixtureProbe.check(spark, tmp)
    assert(ms.size == 1 && ms.head.table == "region" && ms.head.detail.contains("unreadable"))
  }
}
