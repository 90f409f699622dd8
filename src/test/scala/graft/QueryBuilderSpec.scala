package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

import graft.sources.SqlSource
import graft.sql.QueryBuilder

/** Golden SQL-string parity with the reference's own test suite
  * (tests/test_export.py:76–209) — byte-for-byte assertions on the
  * generated query text per sync type.
  */
class QueryBuilderSpec extends AnyFunSuite {

  private val T = "test_catalog.test_schema.test_table"

  test("full sync basic (test_export.py:76–84)") {
    assert(QueryBuilder.full(T) == s"SELECT * FROM $T")
  }

  test("full sync with filter (test_export.py:86–99)") {
    assert(QueryBuilder.full(T, "user_id,email") ==
      s"SELECT * FROM $T " +
        "WHERE user_id IS NOT NULL AND user_id != '' " +
        "AND email IS NOT NULL AND email != ''")
  }

  test("time-based basic (test_export.py:102–114)") {
    assert(QueryBuilder.timeBased(T, "updated_at", 1000000L) ==
      s"SELECT * FROM $T WHERE unix_timestamp(updated_at)*1000 >= 1000000")
  }

  test("time-based with delay upper bound (test_export.py:116–133)") {
    assert(QueryBuilder.timeBased(T, "updated_at", 1000000L,
      delayMs = 5000L, nowMs = 2000000L) ==
      s"SELECT * FROM $T " +
        "WHERE unix_timestamp(updated_at)*1000 >= 1000000 " +
        "AND unix_timestamp(updated_at)*1000 <= 1995000")
  }

  test("scd-latest golden string (test_export.py:136–154)") {
    assert(QueryBuilder.scdLatest(T, "user_id", "updated_at") ==
      "SELECT *\n" +
        "FROM (\n" +
        "    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY updated_at DESC) AS row_num\n" +
        s"    FROM $T\n" +
        ") RankedRows\n" +
        "WHERE row_num = 1")
  }

  test("scd-latest missing columns raises (test_export.py:156–162)") {
    val e = intercept[IllegalArgumentException](QueryBuilder.scdLatest(T, "", "t"))
    assert(e.getMessage.contains("scd-latest sync requires"))
  }

  test("cdc first sync golden string (test_export.py:166–183)") {
    // 2024-01-01T12:00:00Z
    assert(QueryBuilder.cdcFirstSync(T, 1704110400000L) ==
      s"SELECT 'INSERT' as _mp_change_type, * FROM $T " +
        "TIMESTAMP AS OF '2024-01-01T12:00:00+00:00'")
  }

  test("cdc incremental golden string, +1 ms exclusive start (test_export.py:185–209)") {
    // cutoff 2024-01-01T12:00:00.123Z → start .124000; end 2024-01-02T12:00:00.123Z
    // (the reference's end carries µs from current_timestamp; our watermark
    //  protocol is ms-based, matching datetime_to_ms's truncation.)
    assert(QueryBuilder.cdcIncremental(T, 1704110400123L, 1704196800123L) ==
      "\n" +
        "    SELECT CASE\n" +
        "        WHEN _change_type = 'update_postimage' THEN 'INSERT'\n" +
        "        WHEN _change_type = 'update_preimage' THEN 'DELETE'\n" +
        "        WHEN _change_type = 'insert' THEN 'INSERT'\n" +
        "        ELSE 'DELETE'\n" +
        "    END as _mp_change_type, *\n" +
        s"    FROM table_changes('$T', '2024-01-01T12:00:00.124000+00:00', '2024-01-02T12:00:00.123000+00:00')\n" +
        "    ")
  }

  test("param resolution for reporting (export.py:330–332)") {
    assert(QueryBuilder.resolveParams(
      "SELECT * FROM t WHERE ts <= :end_timestamp AND ts >= :start_timestamp",
      Map("end_timestamp" -> "E", "start_timestamp" -> "S")) ==
      "SELECT * FROM t WHERE ts <= 'E' AND ts >= 'S'")
  }

  test("custom SQL path selection: initial vs recurring (export.py:81)") {
    val init = SqlSource.queryPath("/b", "p", "c", "s", "t", timeCutoffMs = 0)
    val rec = SqlSource.queryPath("/b", "p", "c", "s", "t", timeCutoffMs = 5)
    assert(init.toString == "/b/p/queries/c/s/t/initial_query.sql")
    assert(rec.toString == "/b/p/queries/c/s/t/recurring_query.sql")
  }

  test("custom SQL load: params carry end always, start only when recurring") {
    val dir = Files.createTempDirectory("graft-sql")
    val p = dir.resolve("q.sql")
    Files.writeString(p, "SELECT 1")
    val (_, p0) = SqlSource.load(p, timeCutoffMs = 0, endMs = 1704110400000L)
    assert(p0 == Map("end_timestamp" -> "2024-01-01T12:00:00+00:00"))
    val (_, p1) = SqlSource.load(p, timeCutoffMs = 1704110400123L, endMs = 1704196800000L)
    assert(p1("start_timestamp") == "2024-01-01T12:00:00.124000+00:00")
  }

  test("custom SQL missing file raises FileNotFound (export.py:84–87)") {
    val e = intercept[java.io.FileNotFoundException](
      SqlSource.load(java.nio.file.Paths.get("/nope/missing.sql"), 0, 0))
    assert(e.getMessage.contains("Custom SQL query file not found"))
  }

  test("property: msToIso round-trips the ms value (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val ms = math.abs(rnd.nextLong() % 4102444800000L) // within year ~2100
      assert(java.time.OffsetDateTime.parse(SqlSource.msToIso(ms))
        .toInstant.toEpochMilli == ms, s"ms=$ms")
    }
  }

  test("property: generateFilter ANDs every column exactly once (seeded sweep)") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val cols = (1 to (1 + rnd.nextInt(8))).map(i => s"c${rnd.nextInt(1000)}_$i")
      val f = QueryBuilder.generateFilter(cols.mkString(","))
      assert(cols.forall(c => f.contains(s"$c IS NOT NULL")))
      assert(f.split(" AND ").length == cols.length * 2)
    }
  }
}
