package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards for the large-SF fixture generator: the generated tables must
  * keep the contracts the 257 gates (and their fixed sync constants)
  * assume, or a silent generator drift would masquerade as engine
  * regressions at sf1.0 — the same failure class FixtureProbe exists
  * for, checked here at generation-logic level without writing files.
  */
class MakeSfSpec extends AnyFunSuite with SparkTestBase {

  test("generated tables satisfy the FixtureProbe schema contract") {
    val dir = java.nio.file.Files.createTempDirectory("graft-makesf").toString
    MakeSf.region(spark).write.parquet(s"$dir/region.parquet")
    MakeSf.nation(spark).write.parquet(s"$dir/nation.parquet")
    MakeSf.customer(spark, 200).write.parquet(s"$dir/customer.parquet")
    MakeSf.supplier(spark, 50).write.parquet(s"$dir/supplier.parquet")
    MakeSf.part(spark, 100).write.parquet(s"$dir/part.parquet")
    MakeSf.orders(spark, 300, nCust = 200).write.parquet(s"$dir/orders.parquet")
    MakeSf.lineitem(spark, 1000, nOrders = 300, nParts = 100, nSupps = 50)
      .write.parquet(s"$dir/lineitem.parquet")
    MakeSf.events(spark, 500, nUsers = 40).write.parquet(s"$dir/events.parquet")
    MakeScaleFixture.documents(spark, 100).write.parquet(s"$dir/documents.parquet")
    MakeScaleFixture.embeddings(spark, 50).write.parquet(s"$dir/embeddings.parquet")
    assert(FixtureProbe.check(spark, dir).isEmpty)
  }

  test("value conventions hold: price identity, date spans, ms events, key ranges") {
    val li = MakeSf.lineitem(spark, 2000, nOrders = 500, nParts = 200, nSupps = 50)
    // exact derived-price identity the join gates rely on
    assert(li.filter(
      abs(col("l_extendedprice") -
        round(col("l_quantity") *
          round(pmod(col("l_partkey"), lit(1000)).cast("double") / 10.0 + 900.0, 1), 2))
        > 0.001).count() == 0L)
    // the fixed sync cutoff (1998-01-01) must SPLIT the shipdate span
    // (NTZ columns read back as LocalDateTime — compare as strings)
    val (lo, hi) = {
      val r = li.agg(min("l_shipdate").cast("string"),
        max("l_shipdate").cast("string")).head()
      (r.getString(0), r.getString(1))
    }
    assert(lo < "1998-01-01" && hi > "1998-01-01", s"shipdate span [$lo, $hi]")
    // keys land inside their dimensions
    val kr = li.agg(max("l_orderkey"), max("l_partkey"), max("l_suppkey")).head()
    assert(kr.getLong(0) < 500 && kr.getLong(1) < 200 && kr.getLong(2) < 50)

    val ev = MakeSf.events(spark, 1000, nUsers = 30)
    // events sit inside Jan 2024 so the EvCutoff/EvEnd constants slice them
    val er = ev.agg(min("ts").cast("string"), max("ts").cast("string")).head()
    assert(er.getString(0) >= "2024-01-01" && er.getString(1) < "2024-01-31")
    // value is nonnegative 2-dp; props is the {"k": n} shape
    assert(ev.filter(col("value") < 0 ||
      round(col("value"), 2) =!= col("value")).count() == 0L)
    assert(ev.filter(!col("props").rlike("""^\{"k": \d+\}$""")).count() == 0L)
  }
}
