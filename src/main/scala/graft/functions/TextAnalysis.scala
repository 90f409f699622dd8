package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for LLM-data pipelines (SURVEY §7.5): token
  * counting, quality scoring, language-ID heuristic, and rolling-hash
  * fingerprinting. The reference exports tables verbatim; these are the
  * scale extensions a training-data pipeline needs on top.
  *
  * Everything here is pure `Column` composition over built-in functions
  * (split / transform / aggregate / filter higher-order functions) — no
  * UDFs, so the scalar parts stay inside whole-stage codegen and nothing
  * crosses a serialization boundary. Each function has a DuckDB-SQL twin
  * (`duck*` methods) rendered from the SAME constants, so the driver's
  * oracle executes the identical formula; ScalaTest + tools/check_oracle.py
  * enforce the parity empirically.
  *
  * Engine-parity ground rules (why the formulas look the way they do):
  *   - integer arithmetic everywhere until one final double division, so
  *     IEEE evaluation order cannot drift between engines;
  *   - left-fold (`aggregate` / `list_reduce`) for hashes — both engines
  *     fold left-to-right;
  *   - `round(x, 6)` on anything double-valued that reaches an output.
  */
object TextAnalysis {

  /** Stopword list for quality scoring (tiny on purpose — a real pipeline
    * would load a language-specific list; the *operator shape* is what
    * matters: per-token membership count over a split array).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")

  /** (language, marker words) for the n-gram/marker language-ID heuristic.
    * First-match-wins tie-break in declaration order; all-zero scores map
    * to "und" (undetermined).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and"),
    "es" -> Seq("el", "los", "una"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "les", "une"))

  /** Polynomial rolling-hash parameters (Rabin–Karp style): 31-base over
    * char codes mod a large prime. Fits BIGINT: acc < 1e9+7, so
    * acc*31+127 < 2^35 — no overflow in either engine.
    */
  val FpBase = 31L
  val FpMod = 1000000007L

  /** BPE-ish tokenizer regex: letter runs, digit runs, or single
    * non-space symbols — the classic pre-tokenization split. Identical
    * semantics in Java regex (Spark) and RE2 (DuckDB) for this pattern.
    */
  val BpeTokenRx = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  // ---------------------------------------------------------------- Spark

  /** Whitespace tokens of trimmed text; empty text → empty array (Spark's
    * `split("", rx)` returns `[""]`, which would miscount).
    */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Token-column variants: every function here is also usable against a
    * pre-bound token array so a multi-stat projection splits the text
    * ONCE. `CollapseProject` will not inline a non-cheap alias that is
    * referenced many times, so `withColumn("w", tokens(c))` is a real
    * binding, not sugar.
    */
  def tokenCountOf(w: Column): Column = size(w).cast("long")

  /** One shared literal vocabulary for every marker/stopword count:
    * all consumers read items of the SAME `WordListCounts(w, list)`
    * subtree, which whole-stage codegen's subexpression elimination
    * folds to ONE token pass per row — where the prior
    * `size(filter(w, t = word))` formulation paid an interpreted
    * lambda scan per WORD per row (~20+ across stopwords + the
    * langId CASE chain; r14).
    */
  private val SharedWordList: Seq[String] =
    (Stopwords ++ LangMarkers.flatMap(_._2)).distinct

  private def sharedCounts(w: Column): Column =
    org.apache.spark.sql.graft.WordListCounts(w, SharedWordList)

  def wordCountOf(w: Column, word: String): Column = {
    val i = SharedWordList.indexOf(word)
    if (i >= 0) sharedCounts(w).getItem(i)
    else org.apache.spark.sql.graft.WordListCounts(w, Seq(word)).getItem(0)
  }

  /** HOF reference formulation of [[wordCountOf]] (parity gate). */
  private[graft] def wordCountOfHof(w: Column, word: String): Column =
    size(filter(w, t => t === lit(word))).cast("long")

  def stopwordCountOf(w: Column): Column =
    Stopwords.map(wordCountOf(w, _)).reduce(_ + _)

  /** [[qualityScore]] against a pre-bound token array (one text split
    * for the whole stat row instead of ~12).
    */
  def qualityScoreOf(c: Column, w: Column): Column = {
    val nTok = tokenCountOf(w).cast("double")
    val nChr = length(c).cast("double")
    val stopRatio = when(nTok === 0.0, 0.0)
      .otherwise(stopwordCountOf(w).cast("double") / nTok)
    val alphaRatio = when(nChr === 0.0, 0.0)
      .otherwise(alphaSpaceCount(c).cast("double") / nChr)
    round(
      lit(0.4) * least(nTok / 100.0, lit(1.0)) +
      lit(0.4) * (lit(1.0) - stopRatio) +
      lit(0.2) * alphaRatio, 6)
  }

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish token count: number of `BpeTokenRx` matches. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeTokenRx), lit(0))).cast("long")

  /** Exact-word occurrence count (duplicates counted). */
  def wordCount(c: Column, word: String): Column =
    wordCountOf(tokens(c), word)

  def stopwordCount(c: Column): Column =
    Stopwords.map(wordCount(c, _)).reduce(_ + _)

  /** Alphabetic-or-space character count (quality signal). */
  def alphaSpaceCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[A-Za-z ]", ""))).cast("long")

  /** Heuristic quality score in [0,1]:
    * 0.4·min(tokens/100, 1) + 0.4·(1 − stopword_ratio) + 0.2·alpha_ratio.
    * Single formula, one rounding at the end. Guarded for empty text.
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val nChr = length(c).cast("double")
    val stopRatio = when(nTok === 0.0, 0.0)
      .otherwise(stopwordCount(c).cast("double") / nTok)
    val alphaRatio = when(nChr === 0.0, 0.0)
      .otherwise(alphaSpaceCount(c).cast("double") / nChr)
    round(
      lit(0.4) * least(nTok / 100.0, lit(1.0)) +
      lit(0.4) * (lit(1.0) - stopRatio) +
      lit(0.2) * alphaRatio, 6)
  }

  /** Marker score for one language = total occurrences of its markers. */
  def langScore(c: Column, lang: String): Column =
    langScoreOf(tokens(c), lang)

  /** [[langScore]] against a pre-bound token array. */
  def langScoreOf(w: Column, lang: String): Column =
    LangMarkers.toMap.apply(lang).map(wordCountOf(w, _)).reduce(_ + _)

  /** Language-ID: first language (declaration order) whose score is
    * maximal and positive; "und" when every score is zero.
    */
  def langId(c: Column): Column = langIdOf(tokens(c))

  /** [[langId]] against a pre-bound token array — the CASE chain
    * references each score several times, so binding the split once
    * matters (~24 re-splits per row otherwise).
    */
  def langIdOf(w: Column): Column = {
    val scores = LangMarkers.map { case (l, _) => l -> langScoreOf(w, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((l, s), els) =>
      when(s > 0 && s === best, lit(l)).otherwise(els)
    }
  }

  /** Canonical text render (the CCNet/Dolma "fuzzy exact" dedup rule):
    * lowercase → non-alphanumerics become spaces → whitespace runs
    * collapse to one space → trim. Docs that differ only in case,
    * punctuation, or spacing canonicalize identically, so an exact
    * fingerprint over the canonical form catches them — the standard
    * cheap tier below MinHash in a curation stack. Pure codegen regex
    * work, no UDF. (ASCII-regime note: Java's `\s` includes `\x0B`
    * where RE2's does not; the corpus contract is ASCII text, where
    * the classes agree — see FIXTURES.md.)
    */
  def canonicalText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** READABILITY (Flesch–Kincaid grade) from three regex counts —
    * the classic curriculum/difficulty signal for training-data mixes:
    *
    *   grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59
    *
    * with the standard large-corpus heuristics: sentences = runs of
    * `[.!?]`, syllables = vowel-group runs `[aeiouy]+` of the
    * lowercased text (the classic approximation — hyphenation
    * dictionaries don't distribute). Both divisors are clamped to ≥ 1
    * so headline-ish fragments score instead of NULLing out.
    *
    * Codegen-friendly narrow projection (regexp_extract_all + size) —
    * no UDF, no shuffle; doubles appear only in the one fixed final
    * expression (6 dp-rounded), counts are exact BIGINTs.
    * Returns (n_words, n_sentences, n_syllables, fk_grade) as a struct.
    */
  def readabilityOf(c: Column, w: Column): Column = {
    val words = greatest(size(w).cast("long"), lit(1L))
    val sents = greatest(
      size(regexp_extract_all(c, lit("[.!?]+"), lit(0))).cast("long"), lit(1L))
    val sylls = size(regexp_extract_all(lower(c), lit("[aeiouy]+"), lit(0)))
      .cast("long")
    val grade = round(
      lit(0.39) * (words.cast("double") / sents.cast("double")) +
        lit(11.8) * (sylls.cast("double") / words.cast("double")) -
        lit(15.59), 6)
    struct(size(w).cast("long").as("n_words"), sents.as("n_sentences"),
      sylls.as("n_syllables"), grade.as("fk_grade"))
  }

  /** Rolling-hash document fingerprint: left fold of
    * `acc·31 + codePoint(char) mod p` over the characters. Native
    * codegen expression since r13 (`PolyFingerprint`) — the prior HOF
    * formulation ([[fingerprintHof]], kept as the parity reference)
    * paid one interpreted lambda eval per character per row and was
    * the surface whose throughput depended on sticky per-JVM JIT
    * state (BASELINE.md r13 bimodal-run investigation).
    */
  def fingerprint(c: Column): Column =
    org.apache.spark.sql.graft.PolyFingerprint(c)

  /** The original HOF formulation of [[fingerprint]] — retained ONLY as
    * the cross-formulation parity reference for NativeExprSpec
    * (`split(c, "")` yields zero-width artifacts at the ends in some
    * engines — the `filter(_ ≠ "")` makes both sides see exactly the
    * characters).
    */
  private[graft] def fingerprintHof(c: Column): Column =
    aggregate(
      filter(split(c, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => (acc * FpBase + ascii(ch).cast("long")) % FpMod)

  // --------------------------------------------------- DuckDB oracle SQL
  // Same formulas rendered for DuckDB. `w` must be bound in the enclosing
  // query as regexp_split_to_array(trim(text), '\s+') with the empty-text
  // guard — see duckTokensBind.

  /** DuckDB twin of [[readabilityOf]]: a 4-column SELECT fragment
    * (`w` bound in the enclosing query).
    */
  def duckReadability(col: String): String = {
    val sents = s"greatest(CAST(len(regexp_extract_all($col, '[.!?]+')) AS BIGINT), 1)"
    val sylls = s"CAST(len(regexp_extract_all(lower($col), '[aeiouy]+')) AS BIGINT)"
    val words = "greatest(CAST(len(w) AS BIGINT), 1)"
    s"""CAST(len(w) AS BIGINT) AS n_words,
       |$sents AS n_sentences,
       |$sylls AS n_syllables,
       |round(0.39 * (CAST($words AS DOUBLE) / CAST($sents AS DOUBLE))
       |      + 11.8 * (CAST($sylls AS DOUBLE) / CAST($words AS DOUBLE))
       |      - 15.59, 6) AS fk_grade""".stripMargin
  }

  /** Binds `w` (token array of `col`) for use by the other duck* snippets:
    * `FROM (SELECT *, ${duckTokensBind("text")} AS w FROM documents) d`.
    */
  def duckTokensBind(col: String): String =
    s"CASE WHEN length(trim($col)) = 0 THEN [] ELSE regexp_split_to_array(trim($col), '\\s+') END"

  def duckTokenCount: String = "CAST(len(w) AS BIGINT)"

  def duckBpeTokenCount(col: String): String =
    s"CAST(len(regexp_extract_all($col, '$BpeTokenRx')) AS BIGINT)"

  def duckWordCount(word: String): String =
    s"CAST(len(list_filter(w, t -> t = '$word')) AS BIGINT)"

  def duckStopwordCount: String =
    Stopwords.map(duckWordCount).mkString(" + ")

  def duckAlphaSpaceCount(col: String): String =
    s"CAST(length($col) - length(regexp_replace($col, '[A-Za-z ]', '', 'g')) AS BIGINT)"

  def duckQualityScore(col: String): String = {
    val nTok = "CAST(len(w) AS DOUBLE)"
    val nChr = s"CAST(length($col) AS DOUBLE)"
    val stopR = s"CASE WHEN $nTok = 0.0 THEN 0.0 ELSE CAST(${duckStopwordCount} AS DOUBLE) / $nTok END"
    val alphaR = s"CASE WHEN $nChr = 0.0 THEN 0.0 ELSE CAST(${duckAlphaSpaceCount(col)} AS DOUBLE) / $nChr END"
    s"round(0.4 * least($nTok / 100.0, 1.0) + 0.4 * (1.0 - ($stopR)) + 0.2 * ($alphaR), 6)"
  }

  def duckLangScore(lang: String): String =
    LangMarkers.toMap.apply(lang).map(duckWordCount).mkString(" + ")

  def duckLangId: String = {
    val best = LangMarkers.map { case (l, _) => s"(${duckLangScore(l)})" }
      .reduce((a, b) => s"greatest($a, $b)")
    val chain = LangMarkers.map { case (l, _) =>
      s"WHEN (${duckLangScore(l)}) > 0 AND (${duckLangScore(l)}) = $best THEN '$l'"
    }.mkString(" ")
    s"CASE $chain ELSE 'und' END"
  }

  def duckCanonicalText(col: String): String =
    s"trim(regexp_replace(regexp_replace(lower($col), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"

  def duckFingerprint(col: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform(list_filter(string_split($col, ''), c -> c <> ''),
       |                   c -> CAST(ascii(c) AS BIGINT))),
       |  (acc, ch) -> (acc * $FpBase + ch) % $FpMod)""".stripMargin

  // ------------------------------------------------- mixed uniform draw
  // [[fingerprint]] is a ROLLING hash: similar inputs give similar
  // magnitudes (consecutive ids land within ±a few of each other), so
  // fp/FpMod is NOT a usable uniform — bucketing by pmod survives
  // (low-order bits still cycle) but inverse-CDF sampling does not: a
  // clustered u picks the same CDF branch for every key. mixedUniform
  // scrambles the magnitude with two QUADRATIC congruential rounds
  // (x → x² + a·x + c mod FpMod): a linear (LCG) round is not enough
  // because linear maps preserve constant input differences — replicate
  // b and b+1 of the same id would stay rank-correlated (measured
  // r≈0.43; the quadratic rounds measure r≈0.00 with uniform marginals,
  // mean 0.493 / sd 0.287 / P(u<e⁻¹) 0.380 on 2000 consecutive ids).
  // All intermediates fit a 64-bit long: fp < FpMod ≈ 1e9 so
  // fp² + a·fp + c < 2.2e18 — ANSI-overflow-safe in Spark and exact
  // BIGINT in DuckDB.

  val MixA1 = 1103515245L
  val MixC1 = 12345L
  val MixA2 = 784588716L
  val MixC2 = 997L

  /** Replicate stepping prime for [[mixToUniform]] callers that derive
    * MANY uniforms from one fingerprint (u_b over (h + b·MixStep) mod
    * FpMod): one string fold per row instead of one per (row,
    * replicate) — the cost that matters when B ≈ 40 draws/row.
    */
  val MixStep = 15485863L

  /** The two quadratic mixing rounds over an already-hashed value in
    * [0, FpMod): x → x² + a·x + c (mod FpMod), twice, → (z+0.5)/FpMod
    * ∈ (0,1). All intermediates < 2.2e18 — 64-bit-safe.
    */
  def mixToUniform(x: Column): Column = {
    val z1 = (x * x + x * MixA1 + MixC1) % FpMod
    val z2 = (z1 * z1 + z1 * MixA2 + MixC2) % FpMod
    (z2.cast("double") + lit(0.5)) / lit(FpMod.toDouble)
  }

  /** Uniform draw in (0,1), a pure cross-engine function of the input
    * string: fingerprint → two quadratic mixing rounds → (z+0.5)/FpMod.
    */
  def mixedUniform(c: Column): Column = mixToUniform(fingerprint(c))

  /** DuckDB twin of [[mixToUniform]] over an already-hashed expression;
    * each round binds its input once via the single-element-list lambda
    * idiom (`list_transform([x], …)[1]`), so `hashed` is evaluated
    * exactly once.
    */
  def duckMixToUniform(hashed: String): String =
    s"""((CAST(list_transform(
       |    list_transform([$hashed],
       |                   x -> (x * x + x * $MixA1 + $MixC1) % $FpMod),
       |    y -> (y * y + y * $MixA2 + $MixC2) % $FpMod)[1]
       |  AS DOUBLE) + 0.5) / $FpMod.0)""".stripMargin

  /** DuckDB twin of [[mixedUniform]]. */
  def duckMixedUniform(col: String): String =
    duckMixToUniform(duckFingerprint(col))
}
