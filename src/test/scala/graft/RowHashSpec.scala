package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RowHash

class RowHashSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def hashes(df: org.apache.spark.sql.DataFrame,
                     ignore: Set[String] = Set.empty): Seq[String] =
    RowHash.withHashColumn(df, "h", ignore)
      .select("h").as[String].collect().toSeq.sorted

  test("hash is invariant to column order (names are sorted)") {
    val df1 = Seq((1, "a", 2.0)).toDF("x", "y", "z")
    val df2 = df1.select("z", "x", "y")
    assert(hashes(df1) == hashes(df2))
  }

  test("ignore columns are excluded exactly by name, not substring") {
    // reference bug (export.py:208): substring membership would drop `id`
    // when `ids_extra` is ignored; exact-name semantics must keep it.
    val df = Seq((1, 7, "a")).toDF("id", "ids_extra", "v")
    val withIgnore = hashes(df, Set("ids_extra"))
    val equivalent = hashes(df.drop("ids_extra"))
    assert(withIgnore == equivalent)
    val dfDifferentId = Seq((2, 7, "a")).toDF("id", "ids_extra", "v")
    assert(hashes(dfDifferentId, Set("ids_extra")) != withIgnore)
  }

  test("hash added even when no ignore columns (fixes reference gate bug)") {
    val df = Seq((1, "a")).toDF("x", "y")
    assert(RowHash.withHashColumn(df, "h").columns.contains("h"))
  }

  test("empty hash column name disables the projection") {
    val df = Seq((1, "a")).toDF("x", "y")
    assert(RowHash.withHashColumn(df, "").columns.toSeq == Seq("x", "y"))
  }

  test("hash is deterministic across evaluations and equals md5 of the json") {
    val df = Seq((1, "a", 2.5)).toDF("b", "a", "c")
    val h1 = hashes(df)
    val h2 = hashes(df)
    assert(h1 == h2)
    // struct fields sorted by name: a, b, c
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("""{"a":"a","b":1,"c":2.5}""".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h1.head == expected)
  }

  test("null fields are omitted from the json (null vs absent equivalence)") {
    val a = Seq((Some(1), Option.empty[String])).toDF("x", "y")
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("""{"x":1}""".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(hashes(a).head == expected)
  }

  test("content checksum: invariant to partitioning and row order, sensitive to one changed row") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    def sum(df: org.apache.spark.sql.DataFrame) =
      RowHash.contentChecksum(df).as[(Long, Long, Long)].head()
    val ref = sum(base)
    assert(ref._1 == 4L)
    assert(sum(base.repartition(7)) == ref)
    assert(sum(base.orderBy(org.apache.spark.sql.functions.col("id").desc)) == ref)
    val tweaked = Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")).toDF("id", "v")
    assert(sum(tweaked) != ref)
    // ignore set: a column excluded from the render cannot perturb it
    val ignored = Seq((1L, "a", 9.9), (2L, "b", 1.1), (3L, "c", 0.0),
      (4L, "d", 7.7)).toDF("id", "v", "noise")
    assert(RowHash.contentChecksum(ignored, Set("noise"))
      .as[(Long, Long, Long)].head() == ref)
  }

  test("content checksum: additive component catches XOR's paired-duplicate blind spot") {
    // The ADVICE scenario: a sink duplicates a block of rows while
    // dropping an equal-sized block, and the corruption cancels under
    // XOR. Even-multiplicity multisets make it deterministic: {a,a,b,b}
    // vs {a,a,a,a} both XOR-fold to 0 with equal n_rows, but the
    // additive fold sees 2h(a)+2h(b) vs 4h(a).
    val good = Seq(1L, 1L, 2L, 2L).map(Tuple1(_)).toDF("id")
    val bad = Seq(1L, 1L, 1L, 1L).map(Tuple1(_)).toDF("id")
    val gc = RowHash.contentChecksum(good).as[(Long, Long, Long)].head()
    val bc = RowHash.contentChecksum(bad).as[(Long, Long, Long)].head()
    assert(gc._1 == 4L && bc._1 == 4L)
    assert(gc._2 == bc._2, "setup: corruption must be invisible to XOR")
    assert(gc._2 == 0L)
    assert(gc._3 != bc._3, "additive checksum must catch it")
  }
}
