package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Exact PHRASE SEARCH over tokenized text — the positional-postings
  * companion to [[Bm25]]'s bag-of-words retrieval: find documents
  * containing the words of `phrase` CONSECUTIVELY, in order.
  *
  * Single-pass shape (no per-word join chain): each token matching
  * phrase word k emits its ALIGNED ANCHOR position (pos − k) together
  * with the bit 1 << k; a document position starts the full phrase iff
  * every bit lands on the same anchor — checked with one integer
  * `bit_or` aggregate against 2ⁿ − 1. So the whole operator is ONE
  * token explode (non-phrase tokens die at the generator's filter —
  * only query-term postings ever reach the exchange, the same pruning
  * BM25's index query path rides) + ONE (doc, anchor) aggregate + ONE
  * doc-level count. Exact integers throughout; overlapping occurrences
  * count individually; a word repeated in the phrase contributes one
  * aligned row per matching k.
  *
  * At index-backed scale the explode is replaced by a positional
  * posting-list scan per phrase word (word-keyed row-group pruning —
  * Bm25.saveIndex's layout with a positions column); the alignment
  * aggregate is identical.
  *
  * Output: (idCol, n_hits) for documents with ≥ 1 occurrence.
  */
object Phrase {

  def phraseHits(docs: DataFrame, textCol: String, idCol: String,
                 phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseHits: empty phrase")
    val full = (1L << phrase.length) - 1L
    // word → the bits of every phrase position it fills (a repeated
    // word fills several)
    val bitsOf: Seq[(String, Seq[Long])] = phrase.zipWithIndex
      .groupBy(_._1).view.mapValues(_.map(p => 1L << p._2)).toSeq
      .sortBy(_._1)
    val bitsCol = bitsOf.foldLeft(lit(null).cast("array<bigint>")) {
      case (acc, (w, bits)) => when(col("_w") === w, typedlit(bits)).otherwise(acc)
    }
    val ks = bitsOf.map { case (w, bits) =>
      w -> bits.map(b => java.lang.Long.numberOfTrailingZeros(b).toLong)
    }.toMap
    val kCol = ks.toSeq.sortBy(_._1).foldLeft(lit(null).cast("array<bigint>")) {
      case (acc, (w, k)) => when(col("_w") === w, typedlit(k)).otherwise(acc)
    }
    val aligned = docs
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("_pos", "_w")))
      .filter(col("_w").isin(phrase.distinct: _*))
      .select(col(idCol), col("_pos").cast("long").as("_pos"),
        explode(arrays_zip(kCol.as("k"), bitsCol.as("bit"))).as("_e"))
      .select(col(idCol), (col("_pos") - col("_e.k")).as("_apos"),
        col("_e.bit").as("_bit"))
      .filter(col("_apos") >= 0L)
    aligned.groupBy(col(idCol), col("_apos"))
      .agg(expr("bit_or(_bit)").as("_mask"))
      .filter(col("_mask") === full)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** DuckDB oracle twin of [[phraseHits]]. */
  def duckPhraseHits(tbl: String, textCol: String, idCol: String,
                     phrase: Seq[String]): String = {
    val full = (1L << phrase.length) - 1L
    val ph = phrase.zipWithIndex.map { case (w, k) =>
      s"(${k}, '${w.replace("'", "''")}')"
    }.mkString(", ")
    s"""WITH tok AS (
       |  SELECT $idCol AS id, unnest(w0) AS w,
       |         CAST(generate_subscripts(w0, 1) AS BIGINT) - 1 AS pos
       |  FROM (SELECT $idCol, ${TextAnalysis.duckTokensBind(textCol)} AS w0
       |        FROM $tbl)),
       |ph(k, w) AS (VALUES $ph),
       |aligned AS (
       |  SELECT tok.id, tok.pos - ph.k AS apos,
       |         CAST(1 AS BIGINT) << ph.k AS bit
       |  FROM tok JOIN ph ON ph.w = tok.w
       |  WHERE tok.pos - ph.k >= 0),
       |anchors AS (
       |  SELECT id, apos FROM aligned GROUP BY id, apos
       |  HAVING bit_or(bit) = $full)
       |SELECT id AS $idCol, CAST(count(*) AS BIGINT) AS n_hits
       |FROM anchors GROUP BY 1""".stripMargin
  }
}
