package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Bloom-filter semi-join pruning: build a fixed-size bitset over the
  * build side's join keys, then prune the probe side with a NARROW
  * filter before any join or shuffle — the standard trick for "join
  * 100 TB of facts against 10M relevant keys" where even a broadcast
  * hash set is too big but 512 bytes of bitset is free.
  *
  * Scale shape: the build is one map-side-combined `bit_or` aggregate
  * to at most m/64 longs (here 64 longs = 512 bytes — METADATA, like
  * k-means centroids), inlined into the probe filter as a literal
  * array. The probe side therefore sees a codegen'd bit-test
  * projection pushed right against its scan: no exchange, no broadcast
  * relation, no join until after pruning. False positives are bounded
  * (~(1-e^{-kn/m})^k) and a downstream exact join removes them; the
  * win is that the exchange after pruning carries only candidates.
  *
  * Engine parity: positions come from the repo's Rabin–Karp
  * fingerprint with per-hash seeds; the bitset build and the bit test
  * are pure integer ops (`bit_or`, shifts, masks — `& 1` makes
  * arithmetic-vs-logical shift moot), identical in DuckDB.
  */
object BloomPrune {

  /** Bitset geometry: m bits in m/64 longs; k seeded hash functions.
    * m=4096, k=3 keeps the sf0.01 gate's false-positive count nonzero
    * (the interesting case) while the bitset stays 512 bytes at any
    * build-side cardinality.
    */
  val BloomBits = 4096
  val BloomWords: Int = BloomBits / 64
  val BloomHashes = 3

  /** Knuth multiplicative mix applied to the Rabin–Karp hash before
    * bucketing: RK of a decimal key string is LINEAR in the last
    * digits, so `% BloomBits` alone maps consecutive ids to
    * consecutive bits — the build side fills contiguous runs and the
    * false-positive rate explodes for sequential key spaces (measured
    * 27% where theory says 0.3%). One multiply-then-mod diffuses the
    * low bits; max product 1e9·2.65e9 ≈ 2.7e18 stays inside BIGINT in
    * both engines (no ANSI overflow).
    */
  val BloomMix = 2654435761L

  /** Bit position of hash i for a key. */
  private def posOf(key: Column, i: Int): Column =
    pmod(pmod(
      TextAnalysis.fingerprint(concat(lit(s"$i:"), key.cast("string")))
        * lit(BloomMix), lit(TextAnalysis.FpMod)),
      lit(BloomBits.toLong))

  /** Distributed bitset build: explode the k positions per key, fold
    * into words with `bit_or`. Returns the dense word array (driver
    * side, ≤ [[BloomWords]] longs — metadata, not data).
    */
  def buildBits(keys: DataFrame, keyCol: String): Array[Long] = {
    val words = keys
      .select(explode(array((0 until BloomHashes)
        .map(i => posOf(col(keyCol), i)): _*)).as("_pos"))
      .select(shiftright(col("_pos"), 6).as("_w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").as("_bit"))
      .groupBy("_w").agg(bit_or(col("_bit")).as("_bits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Array.tabulate(BloomWords)(w => words.getOrElse(w.toLong, 0L))
  }

  /** Membership test against a literal bitset: all k bits set. The
    * trailing `& 1` masks any sign-extension, so arithmetic-vs-logical
    * shift semantics cannot differ between engines.
    */
  def mightContain(key: Column, bits: Array[Long]): Column =
    (0 until BloomHashes).map { i =>
      val pos = posOf(key, i)
      val word = element_at(typedlit(bits.toSeq),
        shiftright(pos, 6).cast("int") + 1)
      call_function("shiftright", word, pos.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)

  /** Pruning audit: how many probe rows pass the Bloom filter vs how
    * many are true members (exact semi-join), and the false-positive
    * overhead the downstream exact join absorbs.
    * Output: (n_candidates, n_members, n_false_positives).
    */
  def pruneAudit(probe: DataFrame, probeKeyCol: String,
                 build: DataFrame, buildKeyCol: String): DataFrame = {
    val bits = buildBits(build, buildKeyCol)
    val candidates = probe.filter(mightContain(col(probeKeyCol), bits))
    val members = probe.join(
      build.select(col(buildKeyCol).as(probeKeyCol)).distinct(),
      Seq(probeKeyCol), "left_semi")
    candidates.agg(count(lit(1)).as("n_candidates"))
      .crossJoin(members.agg(count(lit(1)).as("n_members")))
      .select(col("n_candidates"), col("n_members"),
        (col("n_candidates") - col("n_members")).as("n_false_positives"))
  }

  /** DuckDB oracle twin of [[pruneAudit]]: same seeded positions, but
    * the bitset is modeled as its DISTINCT-position set — a bit is set
    * in the engine's word array exactly iff some build key hashed to
    * that position, so `h_i IN positions` for all i is equivalent to
    * the `(word >> pos) & 1` test (and avoids DuckDB's overflow-checked
    * `1 << 63`). `probeRel`/`buildRel` are relations (optionally
    * filtered subqueries).
    */
  def duckPruneAudit(probeRel: String, probeKeyCol: String,
                     buildRel: String, buildKeyCol: String): String = {
    def fp(i: Int, keyExpr: String): String =
      s"(((${TextAnalysis.duckFingerprint(s"'$i:' || CAST($keyExpr AS VARCHAR)")}) * $BloomMix) % ${TextAnalysis.FpMod}) % $BloomBits"
    val posUnion = (0 until BloomHashes)
      .map(i => s"SELECT ${fp(i, buildKeyCol)} AS pos FROM $buildRel b")
      .mkString(" UNION ALL ")
    val hashes = (0 until BloomHashes)
      .map(i => s"${fp(i, probeKeyCol)} AS h$i").mkString(", ")
    val bitJoins = (0 until BloomHashes)
      .map(i => s"JOIN bits b$i ON b$i.pos = h$i")
      .mkString(" ")
    s"""WITH bits AS (SELECT DISTINCT pos FROM ($posUnion)),
       |pr AS (SELECT $hashes FROM $probeRel p),
       |cand AS (SELECT count(*) AS n_candidates FROM pr $bitJoins),
       |mem AS (SELECT count(*) AS n_members FROM $probeRel p
       |        WHERE $probeKeyCol IN (SELECT $buildKeyCol FROM $buildRel b))
       |SELECT n_candidates, n_members,
       |       n_candidates - n_members AS n_false_positives
       |FROM cand, mem""".stripMargin
  }
}
